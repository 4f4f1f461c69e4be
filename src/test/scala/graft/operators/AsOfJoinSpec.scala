package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def frame(cols: (String, DataType)*)(rows: Seq[Any]*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), 2),
      StructType(cols.map { case (n, t) => StructField(n, t) }))

  private val left = frame("k" -> LongType, "ts" -> LongType, "tag" -> StringType)(
    Seq[Any](1L, 10L, "a"), Seq[Any](1L, 20L, "b"), Seq[Any](1L, 5L, "c"),
    Seq[Any](2L, 10L, "d"), // key with no right rows at all
    Seq[Any](1L, 15L, "e"))

  // Seq[Any] everywhere: Seq(1L, 8L, 1.0) would numerically widen the
  // longs to Double and break the LongType encoder
  private val right = frame("k" -> LongType, "ts" -> LongType, "v" -> DoubleType)(
    Seq[Any](1L, 8L, 1.0), Seq[Any](1L, 15L, 2.0), Seq[Any](1L, 30L, 3.0),
    Seq[Any](3L, 1L, 9.0)) // key with no left rows

  private def run() =
    AsOfJoin.asOf(left, right, "k", "ts", payloadCols = Seq("v"), leftCols = Seq("tag"))
      .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap

  test("each left row gets the latest right row at or before its ts") {
    val out = run()
    assert(out("a") == Some(1.0), "ts 10 -> right at 8")
    assert(out("b") == Some(2.0), "ts 20 -> right at 15, NOT the later 30")
  }

  test("equal timestamps match inclusively; missing history yields null") {
    val out = run()
    assert(out("e") == Some(2.0), "ts 15 == right ts 15: <= is inclusive")
    assert(out("c") == None, "ts 5 predates all right rows")
    assert(out("d") == None, "key 2 has no right rows at all")
  }

  test("a matched right row with a NULL payload is returned as-is, not skipped") {
    // the latest prior row at ts=10 has v = NULL; ASOF semantics return
    // THAT row's (null) payload — a per-column ignoreNulls carry-forward
    // would wrongly reach past it to the ts=8 row
    val r = frame("k" -> LongType, "ts" -> LongType, "v" -> DoubleType, "rts" -> LongType)(
      Seq[Any](1L, 8L, 1.0, 8L), Seq[Any](1L, 10L, null, 10L))
    val l = frame("k" -> LongType, "ts" -> LongType, "tag" -> StringType)(
      Seq[Any](1L, 12L, "x"))
    val out = AsOfJoin.asOf(l, r, "k", "ts", payloadCols = Seq("v", "rts"), leftCols = Seq("tag"))
      .collect().head
    assert(out.isNullAt(3), "asof_v must be the matched row's NULL, not the older 1.0")
    assert(out.getLong(4) == 10L, "asof_rts proves the ts=10 row was the match")
  }

  test("per-key isolation and row preservation") {
    val rows = AsOfJoin.asOf(left, right, "k", "ts", Seq("v"), Seq("tag"))
    assert(rows.count() == left.count(), "as-of is a LEFT join: every left row survives")
    // key 3 exists only on the right: must not leak into the output
    assert(rows.where(org.apache.spark.sql.functions.col("k") === 3L).count() == 0)
  }

  test("one window node, one key shuffle in the plan") {
    val plan = AsOfJoin.asOf(left, right, "k", "ts", Seq("v"), Seq("tag"))
      .queryExecution.optimizedPlan.toString
    assert("\\bWindow \\[".r.findAllIn(plan).size == 1,
      s"payload carry-forwards must share one Window node:\n$plan")
  }

  // ---- the heavy-key bucketed variant: same answers, bounded partitions ----

  private def runBucketed(width: Long) =
    AsOfJoin.asOfBucketed(left, right, "k", "ts", payloadCols = Seq("v"),
        leftCols = Seq("tag"), bucketWidth = width)
      .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap

  test("bucketed as-of is result-identical to the unbucketed path at every granularity") {
    val expected = run()
    // width 1: every timestamp its own bucket (all matches cross buckets
    // via seeds); width 7: buckets cut mid-history; width 1000: one
    // bucket, degenerates to the plain path
    for (width <- Seq(1L, 7L, 1000L))
      assert(runBucketed(width) == expected, s"bucketWidth=$width diverged")
  }

  test("a single hot key holding every row still matches the unbucketed path") {
    // the scenario the bucketing exists for: one key's history would be
    // ONE window partition in asOf; bucketed, it is span/width partitions
    val n = 5000
    val hotLeft = frame("k" -> LongType, "ts" -> LongType, "tag" -> StringType)(
      (0 until n).map(i => Seq[Any](1L, i.toLong * 3, s"t$i")): _*)
    val hotRight = frame("k" -> LongType, "ts" -> LongType, "v" -> DoubleType)(
      // right rows only every 25 ticks: most buckets have NO right row,
      // so seeds must propagate across empty-bucket gaps
      (0 until n by 25).map(i => Seq[Any](1L, i.toLong * 3 + 1, i.toDouble)): _*)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    val exact = collect(AsOfJoin.asOf(hotLeft, hotRight, "k", "ts", Seq("v"), Seq("tag")))
    val bucketed = collect(AsOfJoin.asOfBucketed(hotLeft, hotRight, "k", "ts",
      Seq("v"), Seq("tag"), bucketWidth = 500))
    assert(bucketed.size == n && bucketed == exact)
  }

  test("bucketed carry-forward windows partition on (key, bucket), never bare key") {
    val plan = AsOfJoin.asOfBucketed(left, right, "k", "ts", Seq("v"), Seq("tag"),
        bucketWidth = 7)
      .queryExecution.optimizedPlan.toString
    // the main carry-forward must include __bucket in its PARTITION spec
    // (k, __bucket then __ts ordering); a window that partitions on bare
    // k and orders by __ts is exactly the hot-key straggler this operator
    // exists to avoid. The bucket-SPINE window (partition k, order
    // __bucket — O(#buckets) rows) is the only bare-k window allowed.
    val mainWindow = "windowspecdefinition\\(k#\\d+L, __bucket#\\d+L?, __ts".r
    assert(mainWindow.findFirstIn(plan).isDefined,
      s"row-level window must partition by (key, bucket):\n$plan")
    val bareKeyRowWindow = "windowspecdefinition\\(k#\\d+L, __ts".r
    assert(bareKeyRowWindow.findFirstIn(plan).isEmpty,
      s"a row-level window partitions on bare key (hot-key straggler):\n$plan")
  }
}
