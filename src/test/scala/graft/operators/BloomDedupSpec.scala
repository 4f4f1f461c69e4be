package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Bloom-gated exact-dedup ingest gate: the filter may only PRUNE
  * (definite negatives skip the corpus), never decide — bloom positives
  * get an exact confirm — so whatever the false-positive rate, the
  * result must equal a plain fingerprint anti-join. */
class BloomDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("returns exactly the batch docs whose fingerprint is absent from the corpus") {
    val corpus = frame(1L -> "alpha beta", 2L -> "gamma delta", 3L -> "epsilon")
    val batch = frame(
      10L -> "alpha beta",        // exact dup
      11L -> "Alpha,  BETA!",     // normalization dup (case/punct/ws)
      12L -> "fresh content one",
      13L -> "fresh content two")
    val out = Dedup.newDocsViaBloom(batch, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(12L, 13L))
  }

  test("exactness holds under a deliberately terrible false-positive rate") {
    // fpp 0.5 makes bloom positives common among genuinely-new docs; the
    // confirm join must rescue every one of them
    val corpus = frame((1L to 50L).map(i => i -> s"corpus doc $i"): _*)
    val batch = frame((100L to 140L).map(i =>
      i -> (if (i % 2 == 0) s"corpus doc ${i - 99}" else s"new doc $i")): _*)
    val out = Dedup.newDocsViaBloom(batch, corpus, "doc_id", "text", fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val expected = (100L to 140L).filter(_ % 2 == 1)
    assert(out == expected)
  }

  test("preserves the batch schema and drops the internal columns") {
    val corpus = frame(1L -> "a")
    val batch = frame(2L -> "b").withColumn("lang", lit("en"))
    val out = Dedup.newDocsViaBloom(batch, corpus, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(out.count() == 1)
  }
}
