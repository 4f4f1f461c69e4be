package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NaiveBayesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, l, t) => Row(i, l, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("lang", StringType), StructField("text", StringType))))

  private def lq(p: Double): Long = math.floor(math.log(p) * 1e9).toLong

  // spam: tokens buy(3) pills(1) now(1); ham: hello(3) dear(1) friend(1)
  private val train = docs(
    (1L, "spam", "buy buy pills"),
    (2L, "spam", "buy now"),
    (3L, "ham", "hello dear friend"),
    (4L, "ham", "hello hello"))

  test("train: dense grid, exact counts, Laplace-smoothed quantized logs") {
    val m = NaiveBayes.train(train, "lang", "text", vocabSize = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // vocab = {buy, dear, friend, hello, now, pills}: 6 tokens, dense 2x6
    assert(m.size == 12)
    // spam totals: 5 tokens over the vocab, vused = 6
    assert(m(("spam", "buy"))._1 == 3L)
    assert(m(("spam", "hello"))._1 == 0L)
    assert(m(("ham", "hello"))._1 == 3L)
    assert(m(("spam", "buy"))._2 == lq(4.0 / 11.0))   // (3+1)/(5+6)
    assert(m(("spam", "hello"))._2 == lq(1.0 / 11.0)) // (0+1)/(5+6)
    assert(m(("ham", "dear"))._2 == lq(2.0 / 11.0))   // (1+1)/(5+6)
    // priors: 2 docs each of 4
    assert(m(("spam", "buy"))._3 == lq(0.5))
    assert(m(("ham", "hello"))._3 == lq(0.5))
  }

  test("classify: argmax of exact integer score sums, hand-replayed") {
    val model = NaiveBayes.train(train, "lang", "text", vocabSize = 100)
    val test = docs((10L, "?", "buy pills now"), (11L, "?", "hello dear"))
    val out = NaiveBayes.classify(test, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val spamScore10 = lq(0.5) + lq(4.0 / 11.0) + lq(2.0 / 11.0) + lq(2.0 / 11.0)
    val hamScore10 = lq(0.5) + lq(1.0 / 11.0) * 3
    assert(out(10L) == (("spam", math.max(spamScore10, hamScore10), 3L)))
    assert(spamScore10 > hamScore10)
    assert(out(11L)._1 == "ham")
  }

  test("zero-evidence docs fall back to the prior-argmax label, never drop") {
    val model = NaiveBayes.train(train, "lang", "text", vocabSize = 100)
    val test = docs((20L, "?", "zzz unseen tokens only"), (21L, "?", ""))
    val out = NaiveBayes.classify(test, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size == 2)
    // equal priors -> tie broken label-asc: "ham"
    assert(out(20L) == (("ham", lq(0.5), 0L)))
    assert(out(21L) == (("ham", lq(0.5), 0L)))
  }

  test("score ties break label-ascending") {
    val sym = docs((1L, "b", "x"), (2L, "a", "x"))
    val model = NaiveBayes.train(sym, "lang", "text", vocabSize = 100)
    val out = NaiveBayes.classify(docs((9L, "?", "x x")), model, "doc_id", "text").collect()
    assert(out.head.getString(1) == "a")
  }

  test("vocabulary cut keeps top-N by count, ties token-ascending") {
    val t = docs((1L, "l", "x x x y y z z w"))
    val m = NaiveBayes.train(t, "lang", "text", vocabSize = 2)
      .collect().map(_.getString(1)).toSet
    // counts: x=3, y=2, z=2, w=1 -> top-2 = {x, y} (y < z at the tie)
    assert(m == Set("x", "y"))
  }

  test("classification is partitioning-independent bit for bit") {
    val model = NaiveBayes.train(train, "lang", "text", vocabSize = 100)
    val test = docs((10L, "?", "buy pills now"), (11L, "?", "hello dear"),
      (12L, "?", "nothing known"))
    val a = NaiveBayes.classify(test, model, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = NaiveBayes.classify(test.repartition(7), model, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("confusion matrix matches a manual rollup of classify") {
    val model = NaiveBayes.train(train, "lang", "text", vocabSize = 100)
    val test = docs((10L, "spam", "buy pills now"), (11L, "spam", "hello dear"),
      (12L, "ham", "hello hello friend"))
    val conf = NaiveBayes.confusion(test, model, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc 10 -> spam (right), doc 11 -> ham (wrong), doc 12 -> ham (right)
    assert(conf == Map(("spam", "spam") -> 1L, ("spam", "ham") -> 1L, ("ham", "ham") -> 1L))
  }

  test("vocabSize out of range fails loudly") {
    intercept[IllegalArgumentException] {
      NaiveBayes.train(train, "lang", "text", vocabSize = 0)
    }
    intercept[IllegalArgumentException] {
      NaiveBayes.train(train, "lang", "text", vocabSize = 10001)
    }
  }

  test("bigram features: the grid carries bg#<bucket> tokens and the " +
      "unigram cells are unchanged by their presence") {
    val m = NaiveBayes.train(train, "lang", "text", vocabSize = 100,
        bigramBuckets = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bg = m.keys.map(_._2).filter(_.startsWith("bg#")).toSet
    assert(bg.nonEmpty, "hashed bigram features must enter the vocabulary")
    assert(bg.forall { t =>
      val b = t.stripPrefix("bg#").toLong; b >= 0 && b < 64
    }, s"bucket ids must be in [0, 64): $bg")
    // "buy buy pills" + "buy now" = 3 bigrams; "hello dear friend" +
    // "hello hello" = 3 bigrams -> per-label bigram occurrence totals
    val spamBg = m.collect { case ((l, t), c) if l == "spam" && t.startsWith("bg#") => c }.sum
    assert(spamBg == 3L, s"spam bigram occurrences: $spamBg")
    // unigram counts identical to the unigram-only model
    assert(m(("spam", "buy")) == 3L && m(("ham", "hello")) == 3L)
  }

  test("bigram features separate docs the unigram model provably cannot") {
    // same unigram multiset {a, b}, opposite order; labels follow order
    val ordTrain = docs(
      (1L, "ab", "aa bb"), (2L, "ab", "aa bb"),
      (3L, "ba", "bb aa"), (4L, "ba", "bb aa"))
    val uni = NaiveBayes.train(ordTrain, "lang", "text", vocabSize = 100)
    val big = NaiveBayes.train(ordTrain, "lang", "text", vocabSize = 100,
      bigramBuckets = 64)
    val test = docs((10L, "?", "aa bb"), (11L, "?", "bb aa"))
    val uo = NaiveBayes.classify(test, uni, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bo = NaiveBayes.classify(test, big, "doc_id", "text", bigramBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // unigram scores are order-blind: both docs get the SAME label
    assert(uo(10L) == uo(11L), s"unigram model must be order-blind: $uo")
    // the bigram model recovers the order signal exactly
    assert(bo == Map(10L -> "ab", 11L -> "ba"), s"got $bo")
  }

  test("gate twin: bigram beats unigram on the planted order corpus") {
    // the catalog's nb_confusion_order_* entries, asserted as an
    // inequality the hash gate can't express: diagonal mass (accuracy)
    // of the bigram confusion strictly exceeds the unigram one on the
    // corpus where ONLY token order separates the classes
    def diag(name: String): (Long, Long) = {
      val rows = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      (rows.collect { case (a, p, n) if a == p => n }.sum,
        rows.map(_._3).sum)
    }
    val (uniDiag, uniTot) = diag("nb_confusion_order_unigram")
    val (bigDiag, bigTot) = diag("nb_confusion_order_bigram")
    assert(uniTot == bigTot && bigTot > 0)
    assert(bigDiag == bigTot,
      s"bigram must separate the order corpus perfectly: $bigDiag/$bigTot")
    assert(uniDiag < bigDiag,
      s"unigram must under-perform where only order carries signal: " +
        s"$uniDiag vs $bigDiag of $bigTot")
  }

  test("real tokens that look like bucket ids never merge with bigram features") {
    // 'bg#7' as CORPUS TEXT must not pool its counts with synthetic
    // bigram bucket 7 (r18 ADVICE): in bigram mode it surfaces escaped
    val t = docs((1L, "x", "bg#7 other"), (2L, "y", "plain words"))
    val m = NaiveBayes.train(t, "lang", "text", vocabSize = 100,
      bigramBuckets = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val toks = m.keys.map(_._2).toSet
    assert(toks.contains("t#bg#7"), s"escaped unigram missing: $toks")
    // every bare bg#<n> in the vocab is a synthetic bigram (count comes
    // only from adjacent-pair hashing, never from the literal token)
    assert(!m.exists { case ((_, tok), c) => tok == "bg#7" && c > 1 },
      "literal bg#7 leaked into the synthetic namespace")
    // unigram mode has no synthetic namespace: the literal passes through
    val u = NaiveBayes.train(t, "lang", "text", vocabSize = 100)
      .collect().map(r => r.getString(1)).toSet
    assert(u.contains("bg#7") && !u.contains("t#bg#7"))
  }

  test("the bg# escape is injective: literal t#bg#7 never collides with " +
    "escaped bg#7") {
    // r19 ADVICE: a corpus token 't#bg#7' passed through verbatim would
    // equal the ESCAPED form of corpus token 'bg#7', merging two
    // distinct tokens — both must escape one level up instead
    val t = docs(
      (1L, "x", "bg#7 filler"), (2L, "x", "t#bg#7 filler"),
      (3L, "y", "plain words"))
    val m = NaiveBayes.train(t, "lang", "text", vocabSize = 100,
      bigramBuckets = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cnt = m.collect { case ((l, tok), c) if l == "x" => tok -> c }.toMap
    // each literal surfaces at its own escape level with count exactly 1
    assert(cnt.get("t#bg#7").contains(1L),
      s"escaped bg#7 wrong: ${cnt.get("t#bg#7")}")
    assert(cnt.get("t#t#bg#7").contains(1L),
      s"escaped t#bg#7 wrong: ${cnt.get("t#t#bg#7")}")
  }

  test("bigram classification is partitioning-independent bit for bit") {
    val model = NaiveBayes.train(train, "lang", "text", vocabSize = 100,
      bigramBuckets = 64)
    val test = docs((10L, "?", "buy pills now"), (11L, "?", "hello dear friend"),
      (12L, "?", "buy hello"), (13L, "?", ""))
    val base = NaiveBayes.classify(test, model, "doc_id", "text", bigramBuckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    for (p <- Seq(1, 3, 7)) {
      val out = NaiveBayes.classify(test.repartition(p), model, "doc_id", "text",
          bigramBuckets = 64)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
      assert(out == base, s"partitioning $p changed bigram scores")
    }
  }
}
