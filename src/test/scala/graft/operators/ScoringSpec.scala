package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScoringSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigramFrequencyScore: counts and averages match hand computation") {
    // corpus bigrams: "a b" x2 (docs 1,2), "b c" x1, "x y" x1
    val d = Seq(
      (1L, "a b c"),
      (2L, "a b"),
      (3L, "x y"),
      (4L, "solo"),      // one token: no bigrams
      (5L, "")           // empty: no bigrams
    ).toDF("doc_id", "text")
    val out = Scoring.bigramFrequencyScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "sub-two-token docs drop out")
    assert(out(1L) == ((2L, 3L, 1.5)))   // "a b"(2) + "b c"(1)
    assert(out(2L) == ((1L, 2L, 2.0)))   // "a b"(2)
    assert(out(3L) == ((1L, 1L, 1.0)))   // "x y"(1)
  }

  test("bigramFrequencyScore: whitespace runs normalize like single spaces") {
    val d = Seq((1L, "a   b\tc"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Scoring.bigramFrequencyScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == out(2L), "both docs must produce identical bigrams")
    assert(out(1L) == ((2L, 4L)), "each bigram appears twice corpus-wide")
  }

  test("bigramFrequencyScore: trackTopK covering all bigrams equals the exact join") {
    val d = (1L to 50L).map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} end"))
      .toDF("doc_id", "text")
    val exact = Scoring.bigramFrequencyScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val topAll = Scoring.bigramFrequencyScore(d, "doc_id", "text", trackTopK = Some(10000))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact == topAll, "a top-K covering every bigram must reproduce the exact scores")
  }

  test("bigramFrequencyScore: untracked bigrams floor to frequency 1") {
    // "a b" x3 dominates; "q z" is a singleton that falls outside top-1
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "q z")).toDF("doc_id", "text")
    val out = Scoring.bigramFrequencyScore(d, "doc_id", "text", trackTopK = Some(1))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 3L, "tracked bigram keeps its corpus count")
    assert(out(4L) == 1L, "untracked bigram scores its own occurrence")
  }

  test("repetitionSignals: char-weighted fractions match hand computation") {
    // doc 1: lines "aaaa","b","aaaa" -> dup line chars 4 of 9 line chars;
    //        tokens: aaaa b aaaa -> 2-grams "aaaa b","b aaaa" (each x1,
    //        top = "aaaa b" lexicographically), no repeated 3-gram
    // doc 2: "x y x y x y" -> 2-gram "x y" x3, "y x" x2; text len 11;
    //        top = "x y" (3*3/11); 3-grams "x y x" x2, "y x y" x2 ->
    //        dup chars = 5+5 = 10 of 11
    val d = Seq(
      (1L, "aaaa\nb\naaaa"),
      (2L, "x y x y x y"),
      (3L, "single")).toDF("doc_id", "text")
    val out = Scoring.repetitionSignals(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getString(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L)._1 == 4.0 / 9.0)
    assert(out(1L)._2 == "aaaa b" && out(1L)._3 == 6.0 / 11.0)
    assert(out(1L)._4 == 0.0)
    assert(out(2L)._1 == 0.0)
    assert(out(2L)._2 == "x y" && out(2L)._3 == 9.0 / 11.0)
    assert(out(2L)._4 == 10.0 / 11.0)
    // one token: no grams at all -> null top gram, zero fractions
    val r3 = Scoring.repetitionSignals(d, "doc_id", "text")
      .where(col("doc_id") === 3L).collect().head
    assert(r3.isNullAt(2) && r3.getDouble(3) == 0.0 && r3.getDouble(4) == 0.0)
  }

  test("repetitionSignals: one repeated block dominates the char-weighted signal") {
    // count-based dupLineFraction sees 1 repeat of 3 lines either way;
    // the char-weighted fraction separates tiny-vs-giant repeated lines
    val d = Seq(
      (1L, "tiny\ntiny\n" + ("long boilerplate block " * 8).trim),
      (2L, ("long boilerplate block " * 8).trim + "\n" +
           ("long boilerplate block " * 8).trim + "\ntiny")).toDF("doc_id", "text")
    val out = Scoring.repetitionSignals(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < 0.05 && out(2L) > 0.45,
      s"char weighting must separate the two shapes, got $out")
  }

  test("repetitionSignals: differential against a plain-Scala model on random docs") {
    // exercises the sorted-fold edge cases (empty lines, all-identical
    // docs, single tokens, ties) on inputs no hand fixture anticipates
    val rng = new scala.util.Random(20260813L)
    val vocab = Seq("a", "bb", "ccc", "dd", "e")
    def randDoc(): String = {
      val nLines = rng.nextInt(5) // 0..4
      (0 until nLines).map { _ =>
        val nToks = rng.nextInt(6) // 0..5 -> possible empty line
        (0 until nToks).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
      }.mkString("\n")
    }
    val docs = (1L to 60L).map(i => (i, randDoc()))
    def model(text: String): (Double, Option[String], Double, Double) = {
      val lines = text.split("\n", -1).toSeq
      val lineChars = lines.map(_.length.toLong).sum
      val dupLineChars = lines.groupBy(identity)
        .map { case (l, occ) => (occ.size - 1).toLong * l.length }.sum
      val dlf = if (lineChars == 0) 0.0 else dupLineChars.toDouble / lineChars
      val toks = text.trim.toLowerCase.split("\\s+", -1).toSeq
      def grams(n: Int) =
        if (toks.size < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val g2 = grams(2)
      val top = g2.groupBy(identity).map { case (g, o) => (g, o.size) }
        .toSeq.sortBy { case (g, c) => (-c, g) }.headOption
      val docChars = text.length.toLong
      val topFrac = top match {
        case Some((g, c)) if docChars > 0 => c.toLong * g.length / docChars.toDouble
        case _ => 0.0
      }
      val g3 = grams(3)
      val dupG3 = g3.groupBy(identity)
        .map { case (g, o) => (o.size - 1).toLong * g.length }.sum
      val dupFrac = if (docChars == 0) 0.0 else dupG3.toDouble / docChars
      (dlf, top.map(_._1), topFrac, dupFrac)
    }
    val out = Scoring.repetitionSignals(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), Option(r.getString(2)), r.getDouble(3), r.getDouble(4))).toMap
    docs.foreach { case (id, text) =>
      assert(out(id) == model(text), s"doc $id mismatch for text=${text.replace("\n", "\\n")}")
    }
  }

  test("qualityFilterStratified: keeps only above-median docs per stratum") {
    val d = (1L to 40L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      // longer text -> higher length score -> higher quality
      (i, ("word " * i.toInt).trim, lang)
    }.toDF("doc_id", "text", "lang")
    val out = Scoring.qualityFilterStratified(d, "doc_id", "text", "lang", p = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.nonEmpty)
    val byLang = out.groupBy(_._2)
    assert(byLang.keySet == Set("en", "de"))
    // each stratum keeps at most half (strict > median) and the kept docs
    // are exactly the longest ones of that stratum
    byLang.foreach { case (lang, kept) =>
      assert(kept.size <= 10, s"$lang kept ${kept.size} of 20")
      val keptIds = kept.map(_._1).toSet
      val stratumIds = (1L to 40L).filter(i =>
        (if (i % 2 == 0) "en" else "de") == lang)
      val topHalf = stratumIds.sortBy(-_).take(kept.size).toSet
      assert(keptIds == topHalf, s"$lang kept $keptIds, expected the longest $topHalf")
    }
  }

  test("qualityFilterStratified: approx sketch agrees with exact at moderate size") {
    val d = (1L to 300L).map { i =>
      (i, ("tok " * (i % 60 + 1).toInt).trim, if (i % 3 == 0) "fr" else "en")
    }.toDF("doc_id", "text", "lang")
    val exact = Scoring.qualityFilterStratified(d, "doc_id", "text", "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = Scoring.qualityFilterStratified(d, "doc_id", "text", "lang", approx = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // sketch thresholds sit within rank error of exact: symmetric diff small
    val diff = (exact -- approx) ++ (approx -- exact)
    assert(diff.size <= 15, s"approx diverged from exact on ${diff.size} docs")
  }

  test("dsirLogWeights: target-like docs outweigh off-domain docs") {
    val target = Seq((100L, "physics theorem proof"), (101L, "theorem lemma proof"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "physics theorem proof"),   // on-domain
      (2L, "theorem lemma physics"),   // on-domain-ish
      (3L, "buy cheap pills now"),     // junk, absent from target
      (4L, "cheap cheap pills"))
      .toDF("doc_id", "text")
    val w = Scoring.dsirLogWeights(raw, target, "doc_id", "text", nBuckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(3L) && w(1L) > w(4L))
    assert(w(2L) > w(3L))
    assert(w.keySet == Set(1L, 2L, 3L, 4L), "every raw doc is scored")
  }

  test("dsirLogWeights: n_grams = unigrams + bigrams; weight is partitioning-independent") {
    val target = Seq((9L, "a b")).toDF("doc_id", "text")
    val raw = Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    def run(parts: Int) =
      Scoring.dsirLogWeights(raw.repartition(parts), target, "doc_id", "text",
          nBuckets = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val one = run(1)
    assert(one.map(t => t._1 -> t._2).toMap == Map(1L -> 5L, 2L -> 1L),
      "3 tokens -> 3 unigrams + 2 bigrams; 1 token -> 1 unigram")
    // bit-exact across partitionings: the bucket-sorted in-row fold, not
    // shuffle-arrival order, defines the double sum
    assert(run(7) == one)
  }

  test("percentile normalization: within-group ranks, cross-source comparability") {
    val d = Seq(
      (1L, "a", 0.2), (2L, "a", 0.5), (3L, "a", 0.9),
      (4L, "b", 0.5), (5L, "b", 0.6)
    ).toDF("doc_id", "source", "score")
    val out = Scoring.percentileNormalize(d, "doc_id", "score", "source", nBuckets = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getInt(4))).toMap
    assert(out(1L) == ((0.0, 1)) && out(2L) == ((0.5, 1)) && out(3L) == ((1.0, 2)))
    // raw 0.5 is TOP of nothing in source a (pct 0.5) but BOTTOM of b (pct 0)
    assert(out(4L)._1 == 0.0 && out(5L)._1 == 1.0,
      "same raw score must normalize per source, not globally")
    // null scores drop; ties order by id so pct stays deterministic
    val ties = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "x", 1.0),
        org.apache.spark.sql.Row(2L, "x", 1.0),
        org.apache.spark.sql.Row(3L, "x", null)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType))))
    val t = Scoring.percentileNormalize(ties, "doc_id", "score", "source", nBuckets = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(t == Map(1L -> 0.0, 2L -> 1.0), s"null dropped, tie split by id: $t")
  }

  test("robust scale: hand-computed median/IQR; constant strata excluded; outlier-resistant") {
    val d = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0), (5L, "a", 1000.0),
      (6L, "b", 7.0), (7L, "b", 7.0)
    ).toDF("doc_id", "source", "score")
    val out = Scoring.robustScale(d, "doc_id", "score", "source")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // source a: med 3, p25 2, p75 4 -> IQR 2; the outlier does not move
    // the center or the scale (that is the point)
    assert(out(3L) == 0.0)
    assert(out(1L) == -1.0 && out(4L) == 0.5)
    assert(out(5L) == (1000.0 - 3.0) / 2.0)
    // constant stratum b: IQR 0, excluded
    assert(!out.contains(6L) && !out.contains(7L), s"got ${out.keySet}")
  }

  test("pmi: hand-computed association, collocation outranks chance pair") {
    // "san francisco" always together; "the cat"/"the dog" mix freely
    val d = Seq(
      (1L, "san francisco the cat"),
      (2L, "san francisco the dog"),
      (3L, "the cat the dog"),
      (4L, "san francisco")
    ).toDF("doc_id", "text")
    val out = Scoring.pmiCollocations(d, "doc_id", "text", k = 10, minCount = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // totals: N = 14 unigrams, B = 10 bigrams
    // c(san)=3, c(francisco)=3, c(san francisco)=3
    val expSf = math.log(3.0 * 14 * 14 / (10.0 * 3 * 3))
    val (cSf, pmiSf) = out(("san", "francisco"))
    assert(cSf == 3L)
    assert(math.abs(pmiSf - expSf) < 1e-12, s"$pmiSf vs $expSf")
    // "the cat" (c=2, c(the)=4, c(cat)=2) is weaker association
    val (_, pmiCat) = out(("the", "cat"))
    assert(pmiSf > pmiCat, "a fixed collocation must outrank a chance pair")
  }

  test("pmi: minCount floors hapax pairs; k bounds output; order deterministic") {
    val d = Seq(
      (1L, "aa bb aa bb aa bb"),
      (2L, "unique pairing here")
    ).toDF("doc_id", "text")
    val floored = Scoring.pmiCollocations(d, "doc_id", "text", k = 10, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(!floored.contains(("unique", "pairing")), "hapax pairs must be floored out")
    val capped = Scoring.pmiCollocations(d, "doc_id", "text", k = 1, minCount = 1)
      .collect()
    assert(capped.length == 1)
    val a = Scoring.pmiCollocations(d, "doc_id", "text", k = 5, minCount = 1).collect().toSeq
    val b = Scoring.pmiCollocations(d, "doc_id", "text", k = 5, minCount = 1).collect().toSeq
    assert(a == b, "the cut must be deterministic run to run")
  }

  test("sourceEntropy matches an independent quantized-log hand replica") {
    // a: {x:2, y:1} T=3; b: {x:1, z:1} T=2; corpus: {x:3, y:1, z:1} T=5
    val df = Seq(("a", "x x y"), ("b", "x z")).toDF("source", "text")
    def q(v: Double) = math.floor(v * 1e9).toLong
    def rep(cs: Map[String, Long], corpus: Map[String, Long]) = {
      val t = cs.values.sum
      val tg = corpus.values.sum
      val sp = cs.map { case (k, c) => c * q(math.log(c.toDouble / t)) }.sum
      val sq = cs.map { case (k, c) => c * q(math.log(corpus(k).toDouble / tg)) }.sum
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      (t, cs.size.toLong, r6(-sp.toDouble / 1e9 / t), r6(-sq.toDouble / 1e9 / t),
        r6((sp - sq).toDouble / 1e9 / t))
    }
    val corpus = Map("x" -> 3L, "y" -> 1L, "z" -> 1L)
    val exp = Map(
      "a" -> rep(Map("x" -> 2L, "y" -> 1L), corpus),
      "b" -> rep(Map("x" -> 1L, "z" -> 1L), corpus))
    val out = Scoring.sourceEntropy(df, "source", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(out == exp, s"got $out expected $exp")
    // KL >= 0 up to quantization slack; identical-distribution source
    // of the whole corpus would give exactly 0
    assert(out.values.forall(_._5 >= -1e-6))
  }

  test("sourceEntropy is partitioning-independent bit for bit") {
    val rows = (1 to 200).map(i => (s"s${i % 4}", s"tok${i % 17} tok${i % 5} tok${i % 29}"))
    val a = Scoring.sourceEntropy(rows.toDF("source", "text"), "source", "text")
      .collect().map(_.toString).sorted.toSeq
    val b = Scoring
      .sourceEntropy(rows.toDF("source", "text").repartition(13), "source", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("zipfFit recovers slope -1 on an exact 1/r corpus, intercept ln(C)") {
    // counts C/r for r=1..10 with C=2520 (divisible by 1..10)
    val C = 2520
    val docs = (1 to 10).flatMap { r =>
      val tok = f"t$r%02d"
      Seq.fill(C / r)(tok)
    }.grouped(500).map(_.mkString(" ")).map(Tuple1(_)).toSeq
    val out = Scoring.zipfFit(docs.toDF("text"), "text", k = 10).collect().head
    assert(out.getLong(0) == 10L)
    assert(math.abs(out.getDouble(1) + 1.0) < 1e-5, s"slope ${out.getDouble(1)}")
    assert(math.abs(out.getDouble(2) - math.log(C)) < 1e-4,
      s"intercept ${out.getDouble(2)} vs ${math.log(C)}")
  }

  test("zipfFitCounts matches a BigInt replica on a pre-counted table") {
    val df = Seq(("a", 8L), ("b", 4L), ("c", 2L), ("d", 1L)).toDF("item", "c")
    def q(v: Double) = math.floor(v * 1e9).toLong
    val xs = (1 to 4).map(r => BigInt(q(math.log(r.toDouble))))
    val ys = Seq(8L, 4L, 2L, 1L).map(c => BigInt(q(math.log(c.toDouble))))
    val k = BigInt(4)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (k * sxy - sx * sy).toDouble / (k * sxx - sx * sx).toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Scoring.zipfFitCounts(df, "item", "c", k = 4).collect().head
    assert(out.getLong(0) == 4L)
    assert(out.getDouble(1) == r6(slope), s"slope ${out.getDouble(1)} vs $slope")
    assert(out.getDouble(2) ==
      r6((sy.toDouble - slope * sx.toDouble) / (4 * 1e9)))
  }

  test("zipfFit k bounds and deterministic tie handling") {
    intercept[IllegalArgumentException] {
      Scoring.zipfFit(Seq(Tuple1("a b")).toDF("text"), "text", k = 1)
    }
    // ties in counts: any rank assignment among ties yields the same
    // moment sums (equal y), so repeated runs agree exactly
    val df = Seq(Tuple1("a b c d a b c d a a b b")).toDF("text")
    val r1 = Scoring.zipfFit(df, "text", k = 4).collect().head.toString
    val r2 = Scoring.zipfFit(df.repartition(7), "text", k = 4).collect().head.toString
    assert(r1 == r2)
  }

  test("zipfFitCounts rejects zero/negative/null counts loudly") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    // a count < 1 would make log() NULL and silently null out the whole
    // regression — the contract is enforced, not advisory
    for (bad <- Seq(0L, -3L)) {
      val df = Seq(("a", 5L), ("b", bad)).toDF("item", "c")
      val ex = intercept[Exception] {
        Scoring.zipfFitCounts(df, "item", "c", k = 2).collect()
      }
      assert(chain(ex).contains("must be >= 1"), s"count=$bad: ${chain(ex)}")
    }
    val withNull = Seq(("a", Some(5L)), ("b", None)).toDF("item", "c")
    val ex = intercept[Exception] {
      Scoring.zipfFitCounts(withNull, "item", "c", k = 2).collect()
    }
    assert(chain(ex).contains("must be >= 1"), chain(ex))
  }
}
