package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KeyphrasesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def run(d: org.apache.spark.sql.DataFrame, topK: Int = 3) =
    Keyphrases.rake(d, "doc_id", "text", topK = topK)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getString(1), r.getLong(2))))
      .toMap

  test("hand doc: RAKE scores match the paper's accounting") {
    // "fast scan of big sorted table in fast scan"
    // phrases: [fast scan], [big sorted table], [fast scan]
    // freq: fast 2, scan 2, big 1, sorted 1, table 1
    // degree (sum of phrase lens over occurrences):
    //   fast 2+2=4, scan 4, big 3, sorted 3, table 3
    // word micros: fast 2e6, scan 2e6, big/sorted/table 3e6
    // phrase scores: [fast scan] 4e6, [big sorted table] 9e6
    val out = run(docs(1L -> "fast scan of big sorted table in fast scan"))
    assert(out((1L, 1)) == (("big sorted table", 9000000L)), s"got $out")
    assert(out((1L, 2)) == (("fast scan", 4000000L)), s"got $out")
    assert(out.size == 2, "duplicate phrase occurrences emit one row")
  }

  test("stopword-only and empty docs emit nothing") {
    assert(run(docs(1L -> "the of and to", 2L -> "", 3L -> null.asInstanceOf[String])).isEmpty)
  }

  test("ties rank by phrase text ascending") {
    // two disjoint single-word phrases with identical scores
    val out = run(docs(1L -> "zebra and apple"))
    // each word: freq 1, degree 1 -> 1e6; tie broken by phrase asc
    assert(out((1L, 1)) == (("apple", 1000000L)), s"got $out")
    assert(out((1L, 2)) == (("zebra", 1000000L)), s"got $out")
  }

  test("topK bounds output per doc and scores stay integer-exact under repartition") {
    val rnd = new scala.util.Random(31)
    val words = Vector("alpha", "beta", "gamma", "the", "a", "of", "delta", "eps")
    val rows = (1L to 30L).map(i =>
      i -> (1 to 25).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val base = run(docs(rows: _*), topK = 2)
    assert(base.keys.groupBy(_._1).values.forall(_.size <= 2))
    val repart = Keyphrases.rake(docs(rows: _*).repartition(7), "doc_id", "text", topK = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(base == repart, "partitioning must not perturb scores or ranks")
  }

  test("topK must be positive") {
    intercept[IllegalArgumentException] {
      Keyphrases.rake(docs(1L -> "x"), "doc_id", "text", topK = 0)
    }
  }
}
