package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Schema-drift canary for the event-time family.
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * shipped `events.parquet`'s `ts` under two physical encodings
  * (TIMESTAMP(NANOS) -> LongType nanos under nanosAsLong, then
  * timestamp[us] -> TIMESTAMP_NTZ); the first switch silently broke four
  * catalog entries for two rounds. This spec writes its OWN tiny parquet
  * fixture in every encoding the engine claims to support — it does not
  * depend on the testdata's encoding du jour — and asserts the full
  * sessionize / as-of / range-join pipeline produces byte-identical
  * results from each. A future encoding change that [[Sessionize]]
  * cannot absorb turns exactly one test red with a readable message,
  * instead of dropping oracle entries on the floor.
  */
class TsEncodingCanarySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 40 events, 3 users, mixed types, second-aligned instants (exact in
    * ns, us, and TIMESTAMP alike) with gaps straddling the 1800 s
    * session threshold. */
  private def fixtureRows: Seq[(Long, Long, Long, String, Double)] = {
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z").getEpochSecond
    (0 until 40).map { i =>
      val user = (i % 3).toLong + 1L
      // every 8th event jumps 40 min -> new session; others 10 s apart
      val sec = base + (i / 8) * 2400L + (i % 8) * 10L
      val etype = Seq("view", "click", "error")(i % 3)
      (i.toLong, sec * 1000000L, user, etype, (i % 7) * 1.5)
    }
  }

  private val longSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Write the fixture as parquet with `ts` in the given physical
    * encoding, read it back, and return the scanned frame. */
  private def scanned(encoding: String): DataFrame = {
    val dir = Files.createTempDirectory(s"ts-canary-$encoding").toString
    val df = encoding match {
      case "long_nanos" =>
        val rows = fixtureRows.map { case (id, us, u, t, v) => Row(id, us * 1000L, u, t, v) }
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), longSchema)
      case "timestamp" =>
        val rows = fixtureRows.map { case (id, us, u, t, v) =>
          Row(id, Timestamp.from(java.time.Instant.ofEpochSecond(us / 1000000L)), u, t, v)
        }
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
          longSchema.copy(fields = longSchema.fields.map(f =>
            if (f.name == "ts") f.copy(dataType = TimestampType) else f)))
      case "timestamp_ntz" =>
        val rows = fixtureRows.map { case (id, us, u, t, v) =>
          Row(id, java.time.LocalDateTime.ofInstant(
            java.time.Instant.ofEpochSecond(us / 1000000L), java.time.ZoneOffset.UTC), u, t, v)
        }
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
          longSchema.copy(fields = longSchema.fields.map(f =>
            if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f)))
    }
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private val encodings = Seq("long_nanos", "timestamp", "timestamp_ntz")

  test("parquet round-trip preserves each claimed physical encoding") {
    val expected = Map(
      "long_nanos" -> LongType, "timestamp" -> TimestampType,
      "timestamp_ntz" -> TimestampNTZType)
    encodings.foreach { e =>
      assert(scanned(e).schema("ts").dataType == expected(e),
        s"fixture for `$e` did not survive the parquet round-trip — canary setup broken")
    }
  }

  test("normalizeTs yields one canonical TimestampType frame from every encoding") {
    encodings.foreach { e =>
      val n = Sessionize.normalizeTs(scanned(e))
      assert(n.schema("ts").dataType == TimestampType,
        s"normalizeTs failed to canonicalize encoding `$e`")
    }
  }

  test("sessionize + as-of + range join produce identical results from every encoding") {
    val perEncoding = encodings.map { e =>
      val ev = Sessionize.normalizeTs(scanned(e))
      val sessions = Sessionize.sessionStats(ev)
        .orderBy("user_id", "session_idx").collect().toSeq

      val us = Sessionize.epochMicros(ev, "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), us.as("us"), col("event_id"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), us.as("us"), col("value"))
        .groupBy("user_id", "us").agg(max("value").as("view_value"))
        .withColumn("view_us", col("us"))
      val asof = AsOfJoin.asOf(clicks, views, "user_id", "us",
          payloadCols = Seq("view_value", "view_us"), leftCols = Seq("event_id"))
        .orderBy("user_id", "event_id").collect().toSeq

      val intervals = Sessionize.sessionStats(ev)
        .select("user_id", "session_idx", "start_us", "end_us")
      val errors = ev.where(col("event_type") === "error")
        .select(col("user_id"), us.as("us"), col("event_id"))
      val ranged = RangeJoin.rangeJoin(errors, intervals, "user_id", "us",
          "start_us", "end_us", rightCols = Seq("session_idx"),
          binWidth = 30L * 60 * 1000000)
        .orderBy("user_id", "event_id").collect().toSeq

      e -> ((sessions, asof, ranged))
    }.toMap

    val (refSessions, refAsof, refRanged) = perEncoding("timestamp")
    assert(refSessions.nonEmpty && refAsof.nonEmpty && refRanged.nonEmpty,
      "canary fixture produced empty results — fixture broken, assertions vacuous")
    encodings.foreach { e =>
      val (s, a, r) = perEncoding(e)
      assert(s == refSessions, s"sessionize differs under encoding `$e`")
      assert(a == refAsof, s"as-of join differs under encoding `$e`")
      assert(r == refRanged, s"range join differs under encoding `$e`")
    }
  }
}
