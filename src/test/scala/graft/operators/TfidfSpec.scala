package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TfidfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("hand-computed tf-idf: rare terms outrank common ones") {
    // "cat" df=3 (every doc), "fish" df=1, "dog" df=2
    val d = docs(
      1L -> "cat cat fish",
      2L -> "cat dog",
      3L -> "cat dog")
    val out = Tfidf.topTerms(d, "doc_id", "text", k = 2, minDf = 1)
      .collect().map(r => (r.getLong(0), r.getInt(5)) -> r.getString(1)).toMap
    val n = 3.0
    def idf(df: Int) = math.log((n + 1) / (df + 1)) + 1
    // doc 1: cat tf=2 score 2*idf(3)=2.446; fish tf=1 score idf(1)=1.693
    assert(out((1L, 1)) == "cat" && out((1L, 2)) == "fish")
    // docs 2/3: dog idf(2) = 1.288 > cat idf(3) = 1.223
    assert(out((2L, 1)) == "dog" && out((2L, 2)) == "cat")
    assert(idf(1) > idf(2) && idf(2) > idf(3), "idf must decrease with df")
  }

  test("vocabulary: top-k by total count with doc frequency and term tie-break") {
    val d = docs(
      1L -> "cat cat fish",
      2L -> "cat dog",
      3L -> "cat dog bird")
    val out = Tfidf.vocabulary(d, "doc_id", "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // cat: count 4 df 3; dog: count 2 df 2; bird/fish tie at 1 -> bird first
    assert(out.toSeq == Seq(("cat", 4L, 3L), ("dog", 2L, 2L), ("bird", 1L, 1L)))
    val pruned = Tfidf.vocabulary(d, "doc_id", "text", topK = 10, minCount = 2)
      .collect().map(_.getString(0))
    assert(pruned.toSeq == Seq("cat", "dog"), "minCount must prune the tail")
  }

  test("minDf prunes hapax terms; k bounds output per doc") {
    val d = docs(1L -> "aa bb cc", 2L -> "aa dd", 3L -> "aa")
    val out = Tfidf.topTerms(d, "doc_id", "text", k = 5, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.map(_._2).toSet == Set("aa"), "only df>=2 terms survive")
    val counts = Tfidf.topTerms(d, "doc_id", "text", k = 1, minDf = 1)
      .groupBy("id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 1))
  }

  test("ties rank deterministically by term") {
    val d = docs(1L -> "zz aa", 2L -> "zz aa")
    val r1 = Tfidf.topTerms(d, "doc_id", "text", k = 2, minDf = 1)
      .collect().map(r => (r.getLong(0), r.getInt(5)) -> r.getString(1)).toMap
    assert(r1((1L, 1)) == "aa" && r1((1L, 2)) == "zz")
  }
}
