package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("sessions split on gap > threshold (long-nanos input)") {
    // user 1: events at 0s, 10s, 10s+31min (new session); user 2: one event
    val ns = (s: Long) => s * 1000000000L
    val rows = Seq(
      Row(1L, ns(0), 1.0), Row(1L, ns(10), 2.0), Row(1L, ns(10 + 31 * 60), 4.0),
      Row(2L, ns(5), 8.0))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", LongType),
        StructField("value", DoubleType))))
    val stats = Sessionize.sessionStats(d, gapSeconds = 1800)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(stats((1L, 1L)) == ((2L, 3.0, 0L, 10000000L)))          // first session: 2 events
    assert(stats((1L, 2L)) == ((1L, 4.0, 1870000000L, 1870000000L))) // post-gap session
    assert(stats((2L, 1L)) == ((1L, 8.0, 5000000L, 5000000L)))
  }

  test("timestamp-typed input takes the unix_micros path") {
    val rows = Seq(
      Row(1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      Row(1L, Timestamp.valueOf("2024-01-01 02:00:00"), 2.0))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("value", DoubleType))))
    val sessions = Sessionize.sessions(d).select("session_idx")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(sessions == Seq(1L, 2L)) // 2h gap -> two sessions
  }

  test("equal-timestamp ties: deterministic ordering, one session, stable stats") {
    // three events of one user share the same timestamp; event_id breaks
    // the window-order tie so every evaluation sees the same row stream
    val ns = (s: Long) => s * 1000000000L
    val rows = Seq(
      Row(10L, 1L, ns(100), 1.0), Row(11L, 1L, ns(100), 2.0), Row(12L, 1L, ns(100), 4.0),
      Row(13L, 1L, ns(100 + 31 * 60), 8.0))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("ts", LongType), StructField("value", DoubleType))))
    val first = Sessionize.sessionStats(d).orderBy("user_id", "session_idx").collect().toSeq
    // tied rows all land in session 1, the post-gap event in session 2
    assert(first.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))) ==
      Seq((1L, 3L, 7.0), (2L, 1L, 8.0)))
    // re-evaluation returns the identical result (total window order)
    val again = Sessionize.sessionStats(d).orderBy("user_id", "session_idx").collect().toSeq
    assert(first == again)
  }

  test("reads the provided nanos events table end-to-end") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert(ev.schema("ts").dataType == LongType) // nanosAsLong in effect
    val stats = Sessionize.sessionStats(ev)
    assert(stats.count() > 0)
    val r = stats.selectExpr("min(start_us)", "max(end_us)").head()
    assert(r.getLong(0) > 1600000000L * 1000000L) // sane epoch-micros range
    assert(r.getLong(1) >= r.getLong(0))
  }
}
