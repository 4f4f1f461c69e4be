package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
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

  private def queries(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 2),
      StructType(Seq(StructField("query_id", LongType), StructField("qtext", StringType))))

  test("bm25: hand-computed scores on a 3-doc corpus") {
    val d = docs(
      1L -> "cat cat fish",   // dl 3
      2L -> "cat dog",        // dl 2
      3L -> "cat dog")        // dl 2
    val q = queries(10L -> "fish")
    val out = Tfidf.bm25TopK(d, "doc_id", "text", q, "query_id", "qtext", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    // only doc 1 contains "fish": N=3, df=1, tf=1, dl=3, avgdl=7/3
    val idf = math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5))
    val expected = idf * (1 * (1.2 + 1.0)) / (1 + 1.2 * ((1.0 - 0.75) + 0.75 * 3 / (7.0 / 3)))
    assert(out.length == 1)
    val (qid, did, nTerms, score, rank) = out.head
    assert(qid == 10L && did == 1L && nTerms == 1L && rank == 1)
    assert(math.abs(score - expected) < 1e-12, s"got $score want $expected")
  }

  test("bm25: multi-term queries sum matched terms; rarer terms dominate; k cuts") {
    val d = docs(
      1L -> "cat cat fish",
      2L -> "cat dog",
      3L -> "cat dog bird")
    val q = queries(10L -> "cat fish", 11L -> "dog dog")
    val rows = Tfidf.bm25TopK(d, "doc_id", "text", q, "query_id", "qtext", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(4)) -> (r.getLong(1), r.getLong(2))).toMap
    // query 10: doc 1 matches both terms (rank 1); docs 2/3 match "cat" only
    assert(rows((10L, 1)) == ((1L, 2L)), "doc with the rare term must rank first")
    assert(rows((10L, 2))._2 == 1L)
    // query 11 repeats "dog": distinct-term semantics -> n_terms = 1
    assert(rows((11L, 1))._2 == 1L && rows((11L, 2))._2 == 1L)
    assert(rows.keys.count(_._1 == 10L) == 2, "k=2 bounds per-query output")
  }

  test("bm25: a term shared by two queries keeps its true document frequency") {
    // regression: df was once counted over (doc, term, query) rows, so a
    // term in two queries got df doubled (idf wrong for both queries)
    val d = docs(1L -> "cat fish", 2L -> "cat dog", 3L -> "bird")
    val solo = Tfidf.bm25TopK(d, "doc_id", "text",
      queries(10L -> "cat"), "query_id", "qtext", k = 5)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val shared = Tfidf.bm25TopK(d, "doc_id", "text",
      queries(10L -> "cat", 11L -> "cat"), "query_id", "qtext", k = 5)
      .where(col("query_id") === 10L)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(solo == shared, "adding a second query with the same term must not move scores")
  }

  test("bm25 maxDf: hot terms drop from scoring; both scorers agree; index path prunes pre-join") {
    // "the" in every doc (df=3); "fish" rare
    val d = docs(1L -> "the cat fish", 2L -> "the dog", 3L -> "the bird")
    val q = queries(10L -> "the fish")
    val capped = Tfidf.bm25TopK(d, "doc_id", "text", q, "query_id", "qtext",
        k = 5, maxDf = Some(2))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(capped == Map(1L -> 1L),
      s"only the rare term may score, and only its doc may match: $capped")
    // the indexed scorer with the same cap returns identical rows
    val idx = Tfidf.bm25Index(d, "doc_id", "text")
    val viaIndex = Tfidf.bm25TopKOnIndex(idx, q, "query_id", "qtext",
        k = 5, maxDf = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val adHoc = Tfidf.bm25TopK(d, "doc_id", "text", q, "query_id", "qtext",
        k = 5, maxDf = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(viaIndex.toSet == adHoc.toSet)
    // uncapped: both paths also agree (full-dictionary df == restricted df)
    val u1 = Tfidf.bm25TopK(d, "doc_id", "text", q, "query_id", "qtext", k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    val u2 = Tfidf.bm25TopKOnIndex(idx, q, "query_id", "qtext", k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(u1.keySet == u2.keySet)
    u1.foreach { case (id, s) =>
      assert(java.lang.Double.compare(s, u2(id)) == 0, s"doc $id drifted") }
  }

  test("snippets: first-occurrence window, edge clipping, stale hits go null") {
    import spark.implicits._
    val d = docs(
      1L -> "a b c TARGET d e f g",
      2L -> "TARGET x y z",
      3L -> "p q r s t u v w TARGET")
    val q = queries(10L -> "target")
    val hits = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 99L))
      .toDF("query_id", "doc_id")
    val out = Tfidf.snippets(hits, d, "doc_id", "text", q, "query_id", "qtext",
        windowTokens = 2)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) -1 else r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((4, "b c target d e")), s"got ${out(1L)}")
    assert(out(2L) == ((1, "target x y")), "window clips at the doc start")
    assert(out(3L) == ((9, "v w target")), "window clips at the doc end")
    assert(!out.contains(99L), "hits for unknown docs drop at the join")
    // a hit whose doc has no query term: null position and snippet
    val stale = Tfidf.snippets(Seq((10L, 1L)).toDF("query_id", "doc_id"),
        docs(1L -> "nothing here"), "doc_id", "text", q, "query_id", "qtext")
      .collect().head
    assert(stale.isNullAt(2) && stale.isNullAt(3))
  }

  test("bm25 index merge: bit-identical to a full rebuild; merges compose") {
    val d = docs(
      1L -> "cat cat fish swims", 2L -> "cat dog barks",
      3L -> "dog dog bird", 4L -> "fish and chips")
    val q = queries(10L -> "cat fish", 11L -> "dog bird")
    def probe(idx: Tfidf.Bm25Index) =
      Tfidf.bm25TopKOnIndex(idx, q, "query_id", "qtext", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
    val full = probe(Tfidf.bm25Index(d, "doc_id", "text"))
    val merged = probe(Tfidf.bm25IndexMerge(
      Tfidf.bm25Index(d.where(col("doc_id") <= 2), "doc_id", "text"),
      d.where(col("doc_id") > 2), "doc_id", "text"))
    assert(full.keySet == merged.keySet)
    full.foreach { case (k, (n, s)) =>
      assert(merged(k)._1 == n)
      assert(java.lang.Double.compare(s, merged(k)._2) == 0, s"$k drifted") }
    // associativity: merging in two steps equals one rebuild too
    val twoStep = probe(Tfidf.bm25IndexMerge(
      Tfidf.bm25IndexMerge(
        Tfidf.bm25Index(d.where(col("doc_id") === 1), "doc_id", "text"),
        d.where(col("doc_id") === 2 || col("doc_id") === 3), "doc_id", "text"),
      d.where(col("doc_id") === 4), "doc_id", "text"))
    assert(twoStep == full)
  }

  test("bm25: score is partitioning-independent (the in-row term-sorted fold)") {
    val d = docs((1L to 40L).map(i =>
      i -> s"alpha beta gamma t$i ${"delta " * (i % 5).toInt}".trim): _*)
    val q = queries(1L -> "alpha beta gamma delta")
    def run(parts: Int) =
      Tfidf.bm25TopK(d.repartition(parts), "doc_id", "text", q, "query_id", "qtext", k = 40)
        .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    val a = run(1)
    val b = run(7)
    assert(a.keySet == b.keySet)
    a.foreach { case (id, s) =>
      assert(java.lang.Double.compare(s, b(id)) == 0, s"doc $id: $s vs ${b(id)}")
    }
  }
}
