package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DuplicationScoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def run(d: org.apache.spark.sql.DataFrame, n: Int = 3, minDf: Long = 2L) =
    Dedup.duplicationScores(d, "doc_id", "text", n, minDf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("hand corpus: shared trigrams raise exactly the sharing docs' scores") {
    val out = run(docs(
      1L -> "the quick brown fox jumps",   // 3 trigrams, 2 shared with doc 2
      2L -> "the quick brown fox sleeps",  // shares "the quick brown", "quick brown fox"
      3L -> "completely different words here"))
    assert(out(1L) == ((3L, 2L, 0.666667)), s"got ${out(1L)}")
    assert(out(2L) == ((3L, 2L, 0.666667)), s"got ${out(2L)}")
    assert(out(3L) == ((2L, 0L, 0.0)), s"got ${out(3L)}")
  }

  test("an exact duplicate pair scores 1.0; the unique doc 0.0") {
    val out = run(docs(
      1L -> "one two three four five",
      2L -> "one two three four five",
      3L -> "six seven eight nine ten"))
    assert(out(1L)._3 == 1.0 && out(2L)._3 == 1.0)
    assert(out(3L)._3 == 0.0)
  }

  test("minDf raises the bar: a trigram in 2 docs stops counting at minDf=3") {
    val d = docs(
      1L -> "a b c d",
      2L -> "a b c e",
      3L -> "x y z w")
    assert(run(d)(1L)._2 == 1L, "one shared trigram 'a b c' at minDf=2")
    assert(run(d, minDf = 3L)(1L)._2 == 0L, "df=2 < minDf=3")
  }

  test("short texts fall back to the whole-text shingle, same as the pair operators") {
    // < 3 tokens -> single shingle of the full token join (jaccardCtes CASE)
    val out = run(docs(1L -> "hi there", 2L -> "hi there", 3L -> "hi"))
    assert(out(1L) == ((1L, 1L, 1.0)))
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  test("partitioning-independent and consistent with jaccardPairs' shingle recipe") {
    val rnd = new scala.util.Random(23)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val rows = (1L to 40L).map(i =>
      i -> (1 to 12).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val base = run(docs(rows: _*))
    val repart = Dedup.duplicationScores(
      docs(rows: _*).repartition(7), "doc_id", "text", 3, 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(base == repart)
    // every score is a valid fraction over the doc's distinct trigrams
    assert(base.values.forall { case (n, d, f) =>
      d <= n && math.abs(f - d.toDouble / n) < 1e-6 })
  }

  test("minDf below 2 is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.duplicationScores(docs(1L -> "x"), "doc_id", "text", 3, 1L)
    }
  }
}
