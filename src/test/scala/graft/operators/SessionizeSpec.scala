package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, unix_micros}
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
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
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

  test("timestamp_ntz input casts through TIMESTAMP (UTC session tz => exact)") {
    val rows = Seq(
      Row(1L, java.time.LocalDateTime.parse("2024-01-01T00:00:00"), 1.0),
      Row(1L, java.time.LocalDateTime.parse("2024-01-01T02:00:00"), 2.0))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampNTZType),
        StructField("value", DoubleType))))
    val out = Sessionize.sessions(d).select("event_us", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // NTZ wall-clock == UTC instant under the pinned UTC session tz
    val jan1 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000L
    assert(out == Seq((jan1, 1L), (jan1 + 7200L * 1000000L, 2L)))
  }

  test("normalizeTs coerces all three physical encodings to one TimestampType frame") {
    val base = java.time.Instant.parse("2024-06-01T12:00:00Z")
    val us = base.getEpochSecond * 1000000L
    val asLongNanos = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, us * 1000L)), 1),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", LongType))))
    val asTimestamp = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, Timestamp.from(base))), 1),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType))))
    val asNtz = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, java.time.LocalDateTime.ofInstant(base, java.time.ZoneOffset.UTC))), 1),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampNTZType))))
    val normalized = Seq(asLongNanos, asTimestamp, asNtz).map(Sessionize.normalizeTs(_))
    normalized.foreach(d => assert(d.schema("ts").dataType == TimestampType))
    val instants = normalized.map(_.select(unix_micros(col("ts"))).head().getLong(0))
    assert(instants.forall(_ == us)) // same instant from every encoding
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

  test("reads the provided events table end-to-end, whatever ts encoding") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // the driver has shipped this file as TIMESTAMP(NANOS) (-> LongType under
    // nanosAsLong), timestamp[us] (-> TIMESTAMP_NTZ), and could ship
    // TIMESTAMP next; assert on epochMicros OUTPUT semantics, not the
    // physical encoding du jour
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType)
      .contains(ev.schema("ts").dataType))
    val stats = Sessionize.sessionStats(ev)
    assert(stats.count() > 0)
    val r = stats.selectExpr("min(start_us)", "max(end_us)").head()
    assert(r.getLong(0) > 1600000000L * 1000000L) // sane epoch-micros range
    assert(r.getLong(1) >= r.getLong(0))
  }

  private def typedEvents(rows: (Long, Long, String)*) = {
    val rs = rows.map { case (u, ts, t) => Row(u, ts * 1000000000L, t) }
    spark.createDataFrame(spark.sparkContext.parallelize(rs, 3),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", LongType),
        StructField("event_type", StringType))))
  }

  test("funnel: ordered completion, not set membership") {
    val d = typedEvents(
      // user 1: full ordered funnel
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE click — stage stops at 2
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // user 3: view only
      (3L, 5L, "view"),
      // user 4: click/purchase but never viewed — not in the funnel at all
      (4L, 1L, "click"), (4L, 2L, "purchase"))
    val out = Sessionize.funnel(d, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> (r.getInt(4),
        !r.isNullAt(1), !r.isNullAt(2), !r.isNullAt(3))).toMap
    assert(out(1L) == ((3, true, true, true)))
    assert(out(2L) == ((2, true, true, false)),
      "an out-of-order purchase must not complete the funnel")
    assert(out(3L) == ((1, true, false, false)))
    assert(!out.contains(4L), "users who never hit step 1 are outside the funnel")
  }

  test("funnel: earliest qualifying times; repeat events pick the first valid one") {
    val d = typedEvents(
      (1L, 10L, "view"), (1L, 5L, "click"), (1L, 15L, "click"), (1L, 25L, "click"))
    val r = Sessionize.funnel(d, "user_id", "ts", "event_type", Seq("view", "click"))
      .collect().head
    assert(r.getLong(1) == 10L * 1000000L && r.getLong(2) == 15L * 1000000L,
      "step 2 must take the first click AFTER the first view (5s click ignored)")
  }

  test("cohort retention: triangle counts on a hand-built log") {
    val wk = 604800L // seconds per week
    val d = typedEvents(
      // cohort week 0: users 1, 2; user 1 returns weeks 1 and 2, user 2 week 1
      (1L, 10L, "view"), (1L, wk + 5L, "view"), (1L, 2 * wk + 5L, "view"),
      (2L, 20L, "view"), (2L, wk + 9L, "view"),
      // cohort week 1: user 3, never returns
      (3L, wk + 1L, "view"),
      // duplicate same-week events count a user once
      (1L, 11L, "click"))
    val out = Sessionize.cohortRetention(d, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 2L, (0L, 2L) -> 1L,
      (1L, 1L) -> 1L), s"got $out")
  }

  test("hourly anomalies: hand-computed z from integer sums; constant types excluded") {
    // type A: nine hours of 4 events + one hour of 20 -> n=10, mean 5.6,
    // var = (10*544 - 3136)/100 = 23.04, sd = 4.8, z(20) = 14.4/4.8 = 3.0
    // (a 3-bucket fixture can't work: max |z| over n points is ~sqrt(n-1))
    // type B constant 2 per hour -> zero variance, excluded entirely
    val hr = 3600L
    def rep(t: String, hour: Long, n: Int) =
      (1 to n).map(i => (hour * 100 + i, hour * hr + i, t))
    val rows = (0L to 8L).flatMap(h => rep("A", h, 4)) ++ rep("A", 9, 20) ++
      (0L to 2L).flatMap(h => rep("B", h, 2))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, s, t) =>
        Row(id, s * 1000000000L, t) }, 3),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType),
        StructField("event_type", StringType))))
    val out = Sessionize.hourlyCountAnomalies(d, "event_type", "ts", zThreshold = 2.0)
      .collect().map(r => (r.getString(1), r.getLong(0)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.keySet == Set(("A", 9L * hr * 1000000L)), s"got ${out.keySet}")
    val (n, z) = out(("A", 9L * hr * 1000000L))
    assert(n == 20L)
    assert(math.abs(z - 3.0) < 1e-12)
  }

  private def ewmaEvents(rows: (Long, Long, Long, Double)*) = {
    val rs = rows.map { case (u, ts, id, v) => Row(u, ts * 1000000000L, id, v) }
    spark.createDataFrame(spark.sparkContext.parallelize(rs, 3),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", LongType),
        StructField("event_id", LongType), StructField("value", DoubleType))))
  }

  test("ewma: hand-computed recurrence in event-time order, not input order") {
    // user 1 rows arrive ts-disordered; fold must follow ts
    val d = ewmaEvents((1L, 30L, 3L, 4.0), (1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0),
      (2L, 5L, 4L, 9.0))
    val out = Sessionize.ewma(d, "user_id", "ts", "event_id", "value", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // y = 1.0 -> 0.5*2+0.5*1 = 1.5 -> 0.5*4+0.5*1.5 = 2.75
    assert(out(1L) == ((3L, 2.75)))
    assert(out(2L) == ((1L, 9.0)), "single event: ewma = the value itself")
  }

  test("ewma: equal timestamps tie-break on event_id; nulls excluded") {
    val d = ewmaEvents((1L, 10L, 2L, 100.0), (1L, 10L, 1L, 0.0))
    val out = Sessionize.ewma(d, "user_id", "ts", "event_id", "value", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // order by (ts, event_id): 0.0 then 100.0 -> 0.5*100 + 0.5*0 = 50
    assert(out(1L) == 50.0)
    val withNull = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(3L, 1000000000L, 1L, 5.0), Row(3L, 2000000000L, 2L, null)), 2),
      StructType(Seq(StructField("user_id", LongType), StructField("ts", LongType),
        StructField("event_id", LongType), StructField("value", DoubleType))))
    val n = Sessionize.ewma(withNull, "user_id", "ts", "event_id", "value", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(n(3L) == ((1L, 5.0)), "null values must not enter the fold or the count")
  }

  test("ewma: bit-identical under repartitioning (in-row fold)") {
    val rows = (1L to 200L).map(i => (i % 7, i, i, (i % 13).toDouble + 0.25))
    def run(parts: Int) =
      Sessionize.ewma(ewmaEvents(rows: _*).repartition(parts),
          "user_id", "ts", "event_id", "value", alpha = 0.3)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = run(1)
    val b = run(11)
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      assert(java.lang.Double.compare(v, b(k)) == 0, s"user $k: $v vs ${b(k)}") }
  }

  test("ewma: chunked composition identity y(AB) = (1-a)^|B| y(A) + y0(B)") {
    // the documented mega-key escape hatch: fold of a concatenation equals
    // the scaled fold of the prefix plus the zero-init fold of the suffix
    val a = 0.3
    val xs = Seq(1.0, 4.0, 2.0, 8.0, 3.0, 5.0)
    def fold(init: Double, rest: Seq[Double]) = rest.foldLeft(init)((acc, x) => a * x + (1 - a) * acc)
    val full = fold(xs.head, xs.tail)
    val (pre, suf) = xs.splitAt(3)
    val yA = fold(pre.head, pre.tail)
    val y0B = suf.foldLeft(0.0)((acc, x) => a * x + (1 - a) * acc)
    assert(math.abs(full - (math.pow(1 - a, suf.size) * yA + y0B)) < 1e-12)
  }

  test("cohort retention: pre-1970 events land in negative weeks (floor, not trunc)") {
    val wk = 604800L
    val d = typedEvents(
      (1L, -1L, "view"),      // 1s before epoch -> week -1 (trunc would say 0)
      (1L, 10L, "view"),      // week 0
      (2L, -wk - 1L, "view")) // just over one week before epoch -> week -2
    val out = Sessionize.cohortRetention(d, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((-1L, -1L) -> 1L, (-1L, 0L) -> 1L, (-2L, -2L) -> 1L),
      s"got $out")
  }


  test("epochMicros nanos arm: negative sub-us nanos floor (not truncate) to micros") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(-1500L, -1000L, -1L, 0L, 999L, 1500L).map(n => Row(n)), 2),
      StructType(Seq(StructField("ts", LongType))))
    val got = d.select(Sessionize.epochMicros(d, "ts").as("us"))
      .collect().map(_.getLong(0)).sorted.toSeq
    // floor(n/1000): -1500 -> -2, -1000 -> -1, -1 -> -1, 0 -> 0,
    // 999 -> 0, 1500 -> 1 (truncation would say -1/-1/0/0/0/1)
    assert(got == Seq(-2L, -1L, -1L, 0L, 0L, 1L), s"got $got")
  }

}
