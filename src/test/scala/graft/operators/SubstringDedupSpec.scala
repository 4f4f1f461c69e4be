package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Substring-level exact dedup (Lee et al. 2022 shape): shared >= k-token
  * spans across documents, reconstructed exactly via the k-gram
  * diagonal-islands merge. */
class SubstringDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  private def tokens(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a shared 60-token license header inside otherwise-different docs is caught exactly") {
    val header = tokens("lic", 60)
    // doc 1: header at token 0; doc 2: 25 own tokens, THEN the header —
    // document-level similarity is low (own texts fully differ), which is
    // exactly the case the document-level operators miss
    val d = docs(
      1L -> s"$header ${tokens("aaa", 40)}",
      2L -> s"${tokens("bbb", 25)} $header ${tokens("ccc", 15)}")
    // sanity: whole-document trigram jaccard lands ~0.42 here — below
    // the 0.8 near-dup line every document-level pass runs at, so these
    // docs would sail through document-level dedup
    val j = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8).collect()
    assert(j.isEmpty, "document-level jaccard must NOT pair these docs at the 0.8 line")
    val spans = Dedup.sharedSpans(d, "doc_id", "text", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // one maximal span: doc1 tokens [0,59] == doc2 tokens [25,84]
    assert(spans.toSeq == Seq((1L, 2L, 0L, 59L, 25L, 84L, 60L)))
  }

  test("overlaps shorter than k are invisible; length-k overlaps are the threshold") {
    val shared19 = tokens("s", 19)
    val shared20 = tokens("t", 20)
    val d = docs(
      1L -> s"$shared19 ${tokens("x", 30)}",
      2L -> s"$shared19 ${tokens("y", 30)}",
      3L -> s"$shared20 ${tokens("p", 30)}",
      4L -> s"$shared20 ${tokens("q", 30)}")
    val spans = Dedup.sharedSpans(d, "doc_id", "text", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(6)))
    assert(spans.toSeq == Seq((3L, 4L, 20L)),
      "19-token overlap below k=20 must not pair; exactly-k overlap must")
  }

  test("identical documents produce one whole-document span") {
    val text = tokens("w", 35)
    val d = docs(1L -> text, 2L -> text)
    val spans = Dedup.sharedSpans(d, "doc_id", "text", k = 20).collect()
    assert(spans.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))).toSeq ==
      Seq((1L, 2L, 0L, 34L, 0L, 34L, 35L)))
  }

  test("two disjoint shared blocks stay two spans (no false bridging)") {
    val blockA = tokens("a", 22)
    val blockB = tokens("b", 25)
    val d = docs(
      1L -> s"$blockA ${tokens("m", 21)} $blockB",
      2L -> s"$blockA ${tokens("n", 21)} $blockB")
    val spans = Dedup.sharedSpans(d, "doc_id", "text", k = 20)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(6))).sortBy(_._1)
    assert(spans.toSeq == Seq((0L, 21L, 22L), (43L, 67L, 25L)))
  }

  test("docs shorter than k tokens never enter the gram index") {
    val d = docs(1L -> tokens("z", 10), 2L -> tokens("z", 10))
    assert(Dedup.sharedSpans(d, "doc_id", "text", k = 20).collect().isEmpty)
  }

  test("mergeSpans unions overlapping and adjacent intervals per doc") {
    val rows = Seq((1L, 0L, 9L), (1L, 5L, 14L), (1L, 15L, 20L), (1L, 30L, 40L),
      (2L, 3L, 7L))
    val df = spark.createDataFrame(rows).toDF("doc_id", "s", "e")
    val merged = Dedup.mergeSpans(df, "doc_id", "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // [0,9]+[5,14] overlap, [15,20] is ADJACENT (15 = 14+1) -> one [0,20];
    // [30,40] stays separate
    assert(merged.toSeq == Seq((1L, 0L, 20L, 21L), (1L, 30L, 40L, 11L), (2L, 3L, 7L, 5L)))
  }

  test("removalSpans removes only the higher-id occurrence and merges per doc") {
    val header = tokens("lic", 60)
    val d = docs(
      1L -> s"$header ${tokens("aaa", 30)}",
      2L -> s"$header ${tokens("bbb", 30)}",
      3L -> s"${tokens("ccc", 10)} $header")
    val removal = Dedup.removalSpans(d, "doc_id", "text", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // doc 1 (lowest id) keeps its copy; docs 2 and 3 lose theirs at the
    // right positions
    assert(removal.toSeq == Seq((2L, 0L, 59L), (3L, 10L, 69L)))
  }

  test("applySpanRemoval cuts exactly the marked intervals; full-dup docs empty out") {
    val header = tokens("lic", 60)
    val own2 = tokens("bbb", 30)
    val d = docs(
      1L -> s"$header ${tokens("aaa", 30)}",   // keeps its copy (lowest id)
      2L -> s"$header $own2",                  // loses the header
      3L -> s"$header ${tokens("aaa", 30)}")   // exact dup of 1 -> fully removed
    val removal = Dedup.removalSpans(d, "doc_id", "text", k = 20)
    val out = Dedup.applySpanRemoval(d, "doc_id", "text", removal)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (s"$header ${tokens("aaa", 30)}", 0L), "lowest id untouched")
    assert(out(2L) == (own2, 60L), "doc 2 loses exactly the 60 header tokens")
    assert(out(3L) == ("", 90L), "an exact dup of a kept doc empties out entirely")
  }

  test("maxDf gram cap: identical output when no gram exceeds the cap") {
    val header = tokens("lic", 60)
    val d = docs(
      1L -> s"$header ${tokens("aaa", 25)}",
      2L -> s"${tokens("bbb", 25)} $header")
    val uncapped = Dedup.sharedSpans(d, "doc_id", "text", k = 20)
      .collect().map(_.toSeq).toSet
    val capped = Dedup.sharedSpans(d, "doc_id", "text", k = 20, maxDf = Some(100L))
      .collect().map(_.toSeq).toSet
    assert(uncapped == capped)
    assert(uncapped.nonEmpty)
  }
}
