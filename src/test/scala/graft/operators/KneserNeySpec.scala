package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KneserNeySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val D = 0.75

  private def docs(rows: Seq[(Long, String)], parts: Int = 4): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), parts),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  /** independent reference implementation of interpolated KN scoring
    * with the operator's tokenization */
  private def reference(rows: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq
    val docBgs = rows.map { case (id, t) =>
      val tk = toks(t)
      id -> tk.zip(tk.drop(1))
    }
    val all = docBgs.flatMap(_._2)
    val c = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> (m.values.sum, m.size.toLong)
    }
    val ncont = c.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val types = c.size.toDouble
    def p(bg: (String, String)): Double = {
      val (tot, n1p) = c1(bg._1)
      math.max(c(bg).toDouble - D, 0.0) / tot.toDouble +
        (D * n1p.toDouble / tot.toDouble) * (ncont(bg._2).toDouble / types)
    }
    docBgs.collect {
      case (id, bgs) if bgs.nonEmpty =>
        // fold in bigram-sorted order over per-(doc, bg) counts, matching
        // the operator's determinism contract
        val perBg = bgs.groupBy(b => b._1 + " " + b._2)
          .map { case (k, v) => k -> (v.size.toLong, math.log(p(v.head))) }
          .toSeq.sortBy(_._1)
        val lsum = perBg.foldLeft(0.0) { case (acc, (_, (cd, lp))) => acc + cd * lp }
        id -> (bgs.size.toLong,
          BigDecimal(lsum / bgs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
  }

  private def run(df: DataFrame): Map[Long, (Long, Double)] =
    Scoring.kneserNeyScore(df, "doc_id", "text", D)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private val corpus = Seq(
    1L -> "san francisco is in california",
    2L -> "san francisco has fog and san jose has sun",
    3L -> "the fog is dense and the sun is warm",
    4L -> "california has fog in san francisco",
    5L -> "one") // single token: no bigrams, must drop

  test("matches an independent reference implementation to 6dp") {
    val got = run(docs(corpus))
    val want = reference(corpus)
    assert(got.keySet == want.keySet && !got.contains(5L))
    got.foreach { case (id, (nb, avg)) =>
      assert(nb == want(id)._1, s"doc $id bigram count")
      assert(math.abs(avg - want(id)._2) <= 1e-6, s"doc $id: $avg vs ${want(id)._2}")
    }
  }

  test("seen-continuation probability mass stays under 1 per context") {
    // reference-side model check: interpolated KN is a proper
    // distribution over the full vocab, so summing only SEEN
    // continuations must stay strictly under 1
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq
    val all = corpus.flatMap { case (_, t) => val tk = toks(t); tk.zip(tk.drop(1)) }
    val c = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c.groupBy(_._1._1).map { case (w, m) => w -> (m.values.sum, m.size.toLong) }
    val ncont = c.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val types = c.size.toDouble
    c1.keys.foreach { w1 =>
      val mass = c.collect { case ((a, b), cnt) if a == w1 =>
        math.max(cnt - D, 0.0) / c1(w1)._1 +
          (D * c1(w1)._2 / c1(w1)._1) * (ncont(b) / types)
      }.sum
      assert(mass > 0 && mass < 1.0 + 1e-9, s"context $w1 mass $mass")
    }
  }

  test("frequent-but-predictable words get less continuation mass than versatile ones") {
    // "francisco" appears only after "san"; "fog" follows several
    // distinct words — KN's continuation count must rank fog higher
    // even when raw frequency favors francisco
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq
    val all = corpus.flatMap { case (_, t) => val tk = toks(t); tk.zip(tk.drop(1)) }
    val c = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ncont = c.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    assert(ncont("francisco") < ncont("fog"))
  }

  test("score is partitioning-independent bit-for-bit") {
    val many = (0L until 40L).map(i =>
      i -> s"tok${i % 7} tok${(i * 3) % 7} tok${(i * 5) % 7} tok${i % 3} shared tail")
    val a = run(docs(many, parts = 1))
    val b = run(docs(many, parts = 13))
    assert(a == b && a.nonEmpty)
  }

  test("discount bound is enforced") {
    intercept[IllegalArgumentException] {
      Scoring.kneserNeyScore(docs(corpus), "doc_id", "text", 1.5)
    }
  }
}
