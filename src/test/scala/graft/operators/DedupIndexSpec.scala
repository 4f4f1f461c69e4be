package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.IndexStore

/** Executes the "persist the corpus-side dedup index" story: the standing
  * corpus's inverted shingle index is written once, bucketed by shingle,
  * and every ingest batch probes the read-back instead of re-shingling
  * the corpus. Three properties are asserted, not just claimed:
  *   1. value parity — the indexed path returns exactly the rows of the
  *      re-shingling path ([[Dedup.jaccardPairsAgainst]]);
  *   2. the probe plan derives shingles ONLY on the batch side — the
  *      corpus contributes a columnar scan with zero regex / explode;
  *   3. under a shuffle join the bucketed index side needs NO exchange
  *      (only the batch side moves) — the property that deletes the
  *      per-batch 100 TB corpus shuffle.
  */
class DedupIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val Table = "graft_test_shingle_index"

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val corpus = docs.where(col("doc_id") < 400)
  private lazy val batch = docs.where(col("doc_id") >= 400)

  private lazy val bucketed = {
    IndexStore.writeBucketed(
      Dedup.shingleIndex(corpus, "doc_id", "text", n = 3), Table, "shingle", 8)
    IndexStore.read(spark, Table)
  }

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  private def exchanges(df: DataFrame): Int =
    "- Exchange ".r.findAllIn(formatted(df)).size

  private def pairKey(df: DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("indexed incremental dedup returns exactly the re-shingling path's pairs") {
    val indexed = pairKey(Dedup.jaccardPairsAgainstIndex(
      batch, bucketed, "doc_id", "text", n = 3, threshold = 0.8))
    val direct = pairKey(Dedup.jaccardPairsAgainst(
      batch, corpus, "doc_id", "text", n = 3, threshold = 0.8))
    assert(direct.nonEmpty, "fixture must produce at least one near-dup pair")
    assert(indexed == direct)
  }

  test("probe plan shingles only the batch side — no corpus-side regex or explode") {
    val plan = formatted(Dedup.jaccardPairsAgainstIndex(
      batch, bucketed, "doc_id", "text", n = 3, threshold = 0.8))
    val control = formatted(Dedup.jaccardPairsAgainst(
      batch, corpus, "doc_id", "text", n = 3, threshold = 0.8))
    def generates(p: String) = "- Generate".r.findAllIn(p).size
    assert(generates(control) == 2, "control: both sides explode shingles")
    assert(generates(plan) == 1, "indexed: only the batch side may explode")
    assert("regexp_extract_all".r.findAllIn(plan).size
      < "regexp_extract_all".r.findAllIn(control).size,
      "indexed plan must not re-derive corpus shingles")
  }

  test("shuffle join against the bucketed index moves ONLY the batch side") {
    // force the sort-merge path: broadcasting the batch would trivially
    // have no index-side exchange without proving the bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val indexed = Dedup.jaccardPairsAgainstIndex(
        batch, bucketed, "doc_id", "text", n = 3, broadcastBatch = false)
      val inMem = Dedup.jaccardPairsAgainstIndex(
        batch, Dedup.shingleIndex(corpus, "doc_id", "text", n = 3),
        "doc_id", "text", n = 3, broadcastBatch = false)
      assert(exchanges(indexed) == exchanges(inMem) - 1,
        "bucketed index must save exactly the corpus-side exchange")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
