package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PackingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 3),
      StructType(Seq(StructField("doc_id", LongType), StructField("n_tokens", LongType))))

  test("exclusive prefix sum matches the single-window formulation on scattered ids") {
    // ids deliberately non-contiguous so linear bucketing sees uneven buckets
    val rows = Seq(3L, 10L, 11L, 57L, 58L, 90L, 1000L, 1001L, 4096L)
      .zipWithIndex.map { case (id, i) => (id, (i * 37 % 11 + 1).toLong) }
    val d = docs(rows: _*)
    for (buckets <- Seq(1, 2, 8, 64)) {
      val dist = Packing.exclusivePrefixSum(d, "doc_id", "n_tokens", buckets)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val single = d.withColumn("offset",
        coalesce(sum("n_tokens").over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(dist == single, s"buckets=$buckets")
    }
  }

  test("packByBudget: offsets chunk into windows; docs straddle boundaries by design") {
    val d = docs(1L -> 600L, 2L -> 600L, 3L -> 600L, 4L -> 600L)
    val packs = Packing.packByBudget(d, "doc_id", "n_tokens", budget = 1000L, numBuckets = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // offsets 0, 600, 1200, 1800 -> packs 0, 0, 1, 1
    assert(packs == Map(
      1L -> (0L, 0L, 0L), 2L -> (600L, 0L, 600L),
      3L -> (1200L, 1L, 200L), 4L -> (1800L, 1L, 800L)))
  }

  test("empty input yields an empty packing, not a crash") {
    assert(Packing.packByBudget(docs(), "doc_id", "n_tokens", 100L).count() == 0)
  }

  test("bpeish token counts drive packing: subword budget holds where whitespace counts overrun") {
    import graft.functions.TextFunctions
    // punctuation-heavy web-ish text: whitespace sees 6 tokens/doc, the
    // BPE-ish proxy sees 15 (letter runs + digit runs + single symbols)
    val text = """Buy now!!! Only $9.99 (50% off)"""
    val rows = (1L to 6L).map(i => Row(i, text))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val counted = d.select(col("doc_id"),
      TextFunctions.wsTokenCount(col("text")).cast("long").as("ws"),
      TextFunctions.bpeishTokenCount(col("text")).cast("long").as("bpeish"))
    val first = counted.orderBy("doc_id").head()
    val (ws, bpeish) = (first.getLong(1), first.getLong(2))
    assert(ws == 6 && bpeish == 15,
      s"fixture drift: ws=$ws bpeish=$bpeish — update the packing math below")

    // budget 30: by ws counts all 6 docs (36 ws tokens) look like ~1.2
    // packs, but the true subword stream is 90 tokens = 3 packs. Packing
    // by bpeish keeps every window within budget under the REAL counts.
    val packed = Packing.packByBudget(
      counted.select(col("doc_id"), col("bpeish").as("n_tokens")),
      "doc_id", "n_tokens", budget = 30L, numBuckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // offsets are the exclusive prefix sum of the bpeish counts...
    assert(packed.sortBy(_._1).map(_._3).toSeq == Seq(0L, 15L, 30L, 45L, 60L, 75L))
    packed.foreach { case (id, n, offset, packId, packOffset) =>
      // ...and every doc's window assignment respects the subword budget
      assert(packId == offset / 30 && packOffset == offset % 30 && packOffset < 30,
        s"doc $id: ($offset, $packId, $packOffset) violates the 30-token budget")
    }
    // the ws-count packing would have declared 2 packs for a 90-subword
    // stream — the overrun this variant exists to prevent
    val wsPacks = Packing.packByBudget(
      counted.select(col("doc_id"), col("ws").as("n_tokens")),
      "doc_id", "n_tokens", budget = 30L, numBuckets = 2)
      .agg(org.apache.spark.sql.functions.max("pack_id")).head().getLong(0) + 1
    assert(wsPacks < (90 + 29) / 30,
      "fixture should demonstrate the whitespace undercount")
  }

  test("packManifest: per-pack ordered ids/offsets, zero-token ties broken by id") {
    // budget 10: docs (1:4)(2:0)(3:0)(4:6) -> offsets 0,4,4,4; pack 0
    // holds all four; ties at offset 4 order by doc_id
    val packed = Packing.packByBudget(
      docs(1L -> 4L, 2L -> 0L, 3L -> 0L, 4L -> 6L, 5L -> 9L), "doc_id", "n_tokens",
      budget = 10L, numBuckets = 3)
    val m = Packing.packManifest(packed).orderBy("pack_id").collect()
    assert(m.length == 2)
    val p0 = m(0)
    assert(p0.getLong(0) == 0L && p0.getLong(1) == 4L && p0.getLong(2) == 10L)
    assert(p0.getSeq[Long](3) == Seq(1L, 2L, 3L, 4L))
    assert(p0.getSeq[Long](4) == Seq(0L, 4L, 4L, 4L))
    val p1 = m(1)
    assert(p1.getSeq[Long](3) == Seq(5L) && p1.getSeq[Long](4) == Seq(0L))
  }

  test("packManifest is partitioning-independent") {
    val rows = (1L to 60L).map(i => i -> (i % 7 + 1))
    def run(parts: Int) = {
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, parts),
        StructType(Seq(StructField("doc_id", LongType), StructField("n_tokens", LongType))))
      Packing.packManifest(Packing.packByBudget(d, "doc_id", "n_tokens", 16L, 4))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](3), r.getSeq[Long](4))).toSet
    }
    assert(run(1) == run(13))
  }

  test("the plan has no unpartitioned data-sized window (scale guard)") {
    val d = docs((1L to 50L).map(i => i -> i): _*)
    val plan = Packing.exclusivePrefixSum(d, "doc_id", "n_tokens", 8)
      .queryExecution.optimizedPlan.toString
    // the only global-ordered window runs over the numBuckets-row totals,
    // whose input is an Aggregate — the corpus-sized window would sit
    // directly over the scan
    val windows = plan.linesIterator.count(_.contains("windowspecdefinition(doc_id"))
    assert(windows == 0, s"corpus-ordered unpartitioned window found:\n$plan")
  }
}
