package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DecontaminationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("flagContaminated counts distinct overlapping trigrams per corpus doc") {
    // bench doc holds "a b c d" -> trigrams {a b c, b c d}
    val bench = docs(100L -> "a b c d")
    val corpus = docs(
      1L -> "x a b c d y", // contains both bench trigrams (+ 4 clean)
      2L -> "a b x c d y", // shares no trigram
      3L -> "q r s t")     // fully clean
    val out = Decontamination.flagContaminated(corpus, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: 6 tokens -> 4 trigrams, 2 contaminated
    assert(out == Set((1L, 4L, 2L)))
  }

  test("ratio and threshold: minOverlap filters, ratio = matched / total") {
    val bench = docs(100L -> "a b c")
    val corpus = docs(1L -> "a b c", 2L -> "a b c x y z")
    val rows = Decontamination
      .flagContaminated(corpus, bench, "doc_id", "text", minOverlap = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(1L) == 1.0)           // 1 trigram, 1 matched
    assert(rows(2L) == 0.25)          // 4 trigrams, 1 matched
    val strict = Decontamination
      .flagContaminated(corpus, bench, "doc_id", "text", minOverlap = 2)
      .collect()
    assert(strict.isEmpty, "no doc shares 2 trigrams with the bench set")
  }

  test("contaminationPairs attributes overlap to the right bench doc") {
    val bench = docs(100L -> "a b c d", 200L -> "p q r s")
    val corpus = docs(1L -> "a b c d and p q r", 2L -> "nothing shared here at all")
    val out = Decontamination.contaminationPairs(corpus, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 vs bench 100: {a b c, b c d}; vs bench 200: {p q r}
    assert(out == Set((1L, 100L, 2L), (1L, 200L, 1L)))
  }

  test("short docs collapse to one whole-text shingle, matching shingleSet") {
    val bench = docs(100L -> "hi there")   // < 3 tokens -> shingle "hi there"
    val corpus = docs(1L -> "hi there", 2L -> "well hi there friend")
    val out = Decontamination.flagContaminated(corpus, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // doc 2's trigrams never equal the 2-token bench shingle
    assert(out == Map(1L -> 1L))
  }

  test("benchmark side is broadcast — no corpus-side shuffle before the rollup") {
    val bench = docs(100L -> "a b c d")
    val corpus = docs((1L to 50L).map(i => i -> s"doc $i a b c d"): _*)
    val plan = Decontamination.flagContaminated(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"benchmark join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$plan")
  }
}
