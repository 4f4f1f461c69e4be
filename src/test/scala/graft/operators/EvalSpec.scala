package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EvalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def auc(rows: Seq[(Double, Int)], buckets: Int = 32): Option[Double] = {
    val r = Eval.aucScore(rows.toDF("s", "l"), "s", "l", buckets).collect().head
    if (r.isNullAt(2)) None else Some(r.getDouble(2))
  }

  test("aucScore hand case with a tie: U = 1 + 0.5 + 2 = 3.5 over P*N = 4") {
    assert(auc(Seq((0.1, 0), (0.2, 0), (0.2, 1), (0.3, 1))) == Some(0.875))
  }

  test("aucScore degenerate cases: separation 1.0, reversal 0.0, all-tied 0.5") {
    assert(auc(Seq((0.1, 0), (0.2, 0), (0.3, 1), (0.4, 1))) == Some(1.0))
    assert(auc(Seq((0.1, 1), (0.2, 1), (0.3, 0), (0.4, 0))) == Some(0.0))
    assert(auc(Seq((0.7, 0), (0.7, 1), (0.7, 0), (0.7, 1))) == Some(0.5))
  }

  test("aucScore single-class and empty inputs give NULL auc") {
    assert(auc(Seq((0.1, 1), (0.2, 1))) == None)
    val r = Eval.aucScore(Seq.empty[(Double, Int)].toDF("s", "l"), "s", "l")
      .collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.isNullAt(2))
  }

  test("non-finite scores are excluded, not silently dropped mid-plan") {
    val rows = Seq((0.1, 0), (0.2, 1), (Double.PositiveInfinity, 1),
      (Double.NegativeInfinity, 0), (Double.NaN, 1))
    val r = Eval.aucScore(rows.toDF("s", "l"), "s", "l").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((1L, 1L, 1.0)))
    val sel = Eval.budgetSelect(
      Seq((1L, 0.5, 2L), (2L, Double.PositiveInfinity, 2L)).toDF("id", "s", "c"),
      "id", "s", "c", budget = 10L).select("id").as[Long].collect()
    assert(sel.toSeq == Seq(1L))
  }

  test("aucScore is bucketing- and partitioning-independent") {
    val rows = (1 to 500).map(i => ((i * 37 % 100) / 100.0, i % 3 min 1))
    val one = auc(rows, buckets = 1)
    assert(auc(rows, buckets = 7) == one)
    val df = rows.toDF("s", "l").repartition(13)
    val r = Eval.aucScore(df, "s", "l").collect().head.getDouble(2)
    assert(Some(r) == one)
  }

  test("calibrationBins clamps, bins, and keeps exact integer evidence") {
    val df = Seq((-0.2, 0), (0.05, 0), (0.05, 1), (0.97, 1), (1.5, 1))
      .toDF("s", "l")
    val out = Eval.calibrationBins(df, "s", "l", bins = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // -0.2 clamps to 0.0 and 1.5 clamps to 1.0 (top bin with 0.97)
    assert(out(0L) == ((3L, 1L, 100000L)), s"got $out")
    assert(out(9L) == ((2L, 2L, 1970000L)), s"got $out")
  }

  test("budgetSelect: score-desc id-asc order, straddler dropped, offsets exact") {
    val df = Seq(
      (1L, 0.9, 6L), (2L, 0.9, 5L), (3L, 0.5, 3L), (4L, 0.2, 1L))
      .toDF("id", "score", "cost")
    val out = Eval.budgetSelect(df, "id", "score", "cost", budget = 10L)
      .orderBy("offset").select("id", "offset").as[(Long, Long)].collect()
    // order: id1 (off 0, fits), id2 (off 6, 6+5>10 dropped), id3 (off 11
    // dropped), id4 (off 14 dropped) — the cut is positional, not knapsack
    assert(out.toSeq == Seq((1L, 0L)))
    val out2 = Eval.budgetSelect(df, "id", "score", "cost", budget = 15L)
      .orderBy("offset").select("id", "offset").as[(Long, Long)].collect()
    assert(out2.toSeq == Seq((1L, 0L), (2L, 6L), (3L, 11L), (4L, 14L)))
  }

  test("budgetSelect is bucketing- and partitioning-independent") {
    val rows = (1 to 400).map(i => (i.toLong, (i * 37 % 100) / 100.0, (i % 7 + 1).toLong))
    val df = rows.toDF("id", "score", "cost")
    def sel(b: Int, parts: Int) =
      Eval.budgetSelect(df.repartition(parts), "id", "score", "cost", 300L, b)
        .select("id", "offset").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val base = sel(1, 1)
    assert(base.nonEmpty)
    assert(sel(8, 13) == base)
    assert(sel(32, 3) == base)
  }

  test("budgetSelect rejects negative costs loudly") {
    val df = Seq((1L, 0.5, 4L), (2L, 0.4, -1L)).toDF("id", "score", "cost")
    val ex = intercept[Exception] {
      Eval.budgetSelect(df, "id", "score", "cost", budget = 10L).collect()
    }
    assert(ex.getMessage.contains("negative cost") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative cost")))
  }

  test("budgetSelect rejects NULL costs loudly") {
    val df = Seq((1L, 0.5, Some(4L)), (2L, 0.4, None))
      .toDF("id", "score", "cost")
    val ex = intercept[Exception] {
      Eval.budgetSelect(df, "id", "score", "cost", budget = 10L).collect()
    }
    assert(ex.getMessage.contains("null cost") ||
      Option(ex.getCause).exists(_.getMessage.contains("null cost")))
  }

  test("budgetSelect keeps a zero-cost row whose offset equals the budget exactly") {
    // offset of id3 is exactly 10 = budget; cost 0 satisfies
    // offset + cost <= budget, so it must be KEPT — with numBuckets
    // high enough that id3's bucket starts at the budget, the bucket
    // prune (not the row filter) is what used to drop it.
    val df = Seq((1L, 0.9, 6L), (2L, 0.8, 4L), (3L, 0.2, 0L))
      .toDF("id", "score", "cost")
    for (buckets <- Seq(1, 32)) {
      val out = Eval.budgetSelect(df, "id", "score", "cost",
          budget = 10L, numBuckets = buckets)
        .orderBy("offset").select("id", "offset").as[(Long, Long)].collect()
      assert(out.toSeq == Seq((1L, 0L), (2L, 6L), (3L, 10L)),
        s"numBuckets=$buckets: ${out.toSeq}")
    }
  }

  test("prCurve: hand-checked confusion counts per threshold") {
    val df = Seq((0.1, 0), (0.2, 1), (0.3, 1), (0.3, 0), (0.4, 1)).toDF("s", "l")
    val out = Eval.prCurve(df, "s", "l").collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(0.1) == ((3L, 2L, 0.6, 1.0, 0.75)), s"got $out")
    assert(out(0.2) == ((3L, 1L, 0.75, 1.0, 0.857143)), s"got $out")
    assert(out(0.3) == ((2L, 1L, 0.666667, 0.666667, 0.666667)), s"got $out")
    assert(out(0.4) == ((1L, 0L, 1.0, 0.333333, 0.5)), s"got $out")
  }

  test("averagePrecision: step-wise AP with tie groups, hand-checked") {
    val df = Seq((0.1, 0), (0.2, 1), (0.3, 1), (0.3, 0), (0.4, 1)).toDF("s", "l")
    // groups desc: 0.4 -> 1*1/1, 0.3 -> 1*2/3, 0.2 -> 1*3/4, 0.1 -> 0
    // quantized: (1e9 + 666666666 + 750000000) / 1e9 / 3 = 0.805556
    val r = Eval.averagePrecision(df, "s", "l").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((3L, 2L, 0.805556)))
    // perfect ranking -> AP 1.0; no positives -> NULL
    val perfect = Eval.averagePrecision(
      Seq((0.1, 0), (0.2, 0), (0.3, 1)).toDF("s", "l"), "s", "l").collect().head
    assert(perfect.getDouble(2) == 1.0)
    val none = Eval.averagePrecision(
      Seq((0.1, 0), (0.2, 0)).toDF("s", "l"), "s", "l").collect().head
    assert(none.isNullAt(2))
  }

  test("thresholdForPrecision: smallest satisfying threshold across a dip") {
    val df = Seq((0.1, 0), (0.2, 1), (0.3, 1), (0.3, 0), (0.4, 1)).toDF("s", "l")
    // precision by threshold: 0.6, 0.75, 0.667 (the dip), 1.0
    def pick(t: Double) =
      Eval.thresholdForPrecision(df, "s", "l", t).collect().head
    val r75 = pick(0.75)
    assert((r75.getDouble(0), r75.getLong(1), r75.getLong(2), r75.getDouble(3)) ==
      ((0.2, 3L, 4L, 0.75)))
    val r90 = pick(0.9)
    assert((r90.getDouble(0), r90.getLong(1), r90.getLong(2), r90.getDouble(3)) ==
      ((0.4, 1L, 1L, 1.0)))
    val none = Eval.thresholdForPrecision(
      Seq((0.1, 1), (0.2, 0)).toDF("s", "l"), "s", "l", 0.9).collect().head
    assert((0 to 3).forall(none.isNullAt), s"unattainable target must be all-NULL")
  }

  test("calibrationEce: exact integer numerator, hand-checked") {
    // bin0: n=2, pos=1, micro = 2*floor(0.05e6) = 100000
    //   |1e6 - 100000| = 900000
    // bin9: n=1, pos=0, micro = 970000 -> |0 - 970000| = 970000
    // ece = (900000 + 970000) / 1e6 / 3 = 0.623333...
    val df = Seq((0.05, 1), (0.05, 0), (0.97, 0)).toDF("s", "l")
    val r = Eval.calibrationEce(df, "s", "l", bins = 10).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 0.623333)
    val e = Eval.calibrationEce(Seq.empty[(Double, Int)].toDF("s", "l"), "s", "l")
      .collect().head
    assert(e.getLong(0) == 0L && e.isNullAt(1))
  }

  test("aucScoreBy matches per-group aucScore and handles single-class groups") {
    val rows = (1 to 300).map { i =>
      (s"g${i % 3}", (i * 37 % 100) / 100.0, (i * 53 % 100) / 50)
    } ++ Seq(("solo", 0.5, 1), ("solo", 0.6, 1)) // single-class group
    val df = rows.toDF("g", "s", "l")
    val by = Eval.aucScoreBy(df, "g", "s", "l").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val sub = rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("s", "l")
      val r = Eval.aucScore(sub, "s", "l").collect().head
      assert(by(g) == ((r.getLong(0), r.getLong(1), Some(r.getDouble(2)))), s"group $g")
    }
    assert(by("solo") == ((2L, 0L, None)))
  }

  test("sourceOverlap: exact pair Jaccard, disjoint pairs kept at zero") {
    val df = Seq(
      ("a", "x y z w"),      // shingles: "x y z", "y z w"
      ("a", "x y z"),        // dup shingle within source collapses
      ("b", "x y z q"),      // shares "x y z" with a
      ("c", "p q r s"))      // disjoint from both
      .toDF("source", "text")
    val out = Eval.sourceOverlap(df, "source", "text", n = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // a: {xyz, yzw}; b: {xyz, yzq}; c: {pqr, qrs}
    assert(out(("a", "b")) == ((2L, 2L, 1L, 0.333333)), s"got $out")
    assert(out(("a", "c")) == ((2L, 2L, 0L, 0.0)), s"got $out")
    assert(out(("b", "c")) == ((2L, 2L, 0L, 0.0)), s"got $out")
  }
}
