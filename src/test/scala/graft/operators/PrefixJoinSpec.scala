package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** jaccardPairsPrefix must be OUTPUT-IDENTICAL to jaccardPairs — the
  * prefix filter changes candidate generation only. Differential over
  * corpora engineered to stress the filter's edges: near-threshold
  * pairs, size-mismatched pairs, exact dups (t=1 keeps a length-1
  * prefix), and a planted hot shingle (the prefix's structural skew
  * win). */
class PrefixJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def both(d: org.apache.spark.sql.DataFrame, n: Int, t: Double) = {
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap
    (canon(Dedup.jaccardPairs(d, "doc_id", "text", n, t)),
      canon(Dedup.jaccardPairsPrefix(d, "doc_id", "text", n, t)))
  }

  test("random corpus differential at thresholds 0.5 / 0.8 / 1.0") {
    val rnd = new scala.util.Random(41)
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val rows = (1L to 40L).flatMap { i =>
      val base = (1 to 10).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
      // a one-token-mutated twin (near-threshold pair) and, for every
      // 10th doc, an exact twin (the t=1.0 case)
      Seq(i -> base, (i + 1000L) -> (base + " " + words(rnd.nextInt(words.size)))) ++
        (if (i % 10 == 0) Seq((i + 2000L) -> base) else Seq.empty)
    }
    for (t <- Seq(0.5, 0.8, 1.0); n <- Seq(1, 3)) {
      val (exact, prefix) = both(docs(rows: _*), n, t)
      assert(prefix == exact, s"mismatch at n=$n t=$t")
      assert(exact.nonEmpty, s"degenerate fixture at n=$n t=$t")
    }
  }

  test("size-mismatched near-dups: the length filter must not over-prune") {
    // B = A plus a 25% tail: J ~ 0.75 -> in at t=0.7, out at t=0.8
    val a = (1 to 12).map(i => s"tok$i").mkString(" ")
    val b = a + " " + (13 to 16).map(i => s"tok$i").mkString(" ")
    val d = docs(1L -> a, 2L -> b)
    for (t <- Seq(0.7, 0.8)) {
      val (exact, prefix) = both(d, 1, t)
      assert(prefix == exact, s"mismatch at t=$t")
    }
    assert(both(d, 1, 0.7)._1.nonEmpty && both(d, 1, 0.8)._1.isEmpty)
  }

  test("planted hot shingle: identical output, and the hot key leaves the prefix index") {
    // every doc shares one boilerplate trigram; distinct tails
    val rows = (1L to 30L).map(i => i -> s"hot hot hot tail${i}a tail${i}b tail${i}c")
    val d = docs((rows :+ (31L -> "hot hot hot tail1a tail1b tail1c")): _*)
    val (exact, prefix) = both(d, 3, 0.8)
    assert(prefix == exact)
    assert(exact.contains((1L, 31L)), "the planted twin must survive")
    // the skew claim itself: "hot hot hot" (df=31) is in NO doc's
    // rarest-first prefix (each doc has 4 distinct trigrams, prefix
    // length 4 - floor(0.8*4) + 1 = 2, and every doc owns >= 2 rarer
    // unique trigrams)
    val sets = d.select(col("doc_id"),
      Dedup.shingleSet(col("text"), 3).as("sh"))
    assert(sets.collect().forall(_.getSeq[String](1).size == 4))
  }

  test("threshold bounds are enforced") {
    intercept[IllegalArgumentException] {
      Dedup.jaccardPairsPrefix(docs(1L -> "x"), "doc_id", "text", 1, 0.0)
    }
  }
}
