package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // keep event times well above epoch 0: the initial watermark is 0 and
  // a row at exactly epoch 0 would be discarded as late data
  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  test("streaming sessionize: session_window groups by gap, watermark closes sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val sessions = StreamOps.sessionize(
      input.toDF().toDF("user_id", "ts", "value"), gapSeconds = 600)
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5 min apart (one session), then 20 min gap (new one)
      input.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0), (1L, ts(25), 4.0))
      q.processAllAvailable()
      // advance watermark far enough to close everything
      input.addData((9L, ts(1000), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_out")
        .select("user_id", "n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)), s"first session wrong: $rows")
      assert(rows.contains((1L, 1L, 4.0)), s"second session wrong: $rows")
    } finally q.stop()
  }

  test("streaming dedup by fingerprint keeps first occurrence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamOps.dedupByFingerprint(
      input.toDF().toDF("doc_id", "ts", "text"), textCol = "text", tsCol = "ts")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // across micro-batches, the earliest-arriving fingerprint wins
      // (within one batch the representative is arbitrary)
      input.addData((1L, ts(0), "Hello,   World!"))
      q.processAllAvailable()
      input.addData(
        (2L, ts(1), "hello world"),      // same fingerprint as 1 -> dropped
        (3L, ts(2), "something else"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("stateless text stats run on a stream with batch-identical results") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stats = StreamOps.textStats(input.toDF().toDF("doc_id", "text"))
    val q = stats.writeStream.format("memory").queryName("stats_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "the quick brown fox"), (2L, "der hund und die katze ist da"))
      q.processAllAvailable()
      val out = spark.table("stats_out")
        .select("doc_id", "n_ws_tokens", "lang").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(out == Set((1L, 4, "en"), (2L, 7, "de")))
      // batch equivalence
      val batch = StreamOps.textStats(
        Seq((1L, "the quick brown fox"), (2L, "der hund und die katze ist da"))
          .toDF("doc_id", "text"))
        .select("doc_id", "n_ws_tokens", "lang").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(batch == out)
    } finally q.stop()
  }
}
