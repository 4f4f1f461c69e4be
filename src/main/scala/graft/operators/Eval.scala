package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-eval / data-selection operators for an LLM data pipeline: the
  * loop that closes curation — score documents with a quality model,
  * MEASURE the scorer (AUC, calibration), then SELECT the best slice
  * under a token budget. Companion to the scoring operators
  * ([[Scoring]], [[graft.functions.TextFunctions]]) the same way
  * retrieval eval (`retrieval_metrics`) companions the ANN stack.
  *
  * Numeric contract, as everywhere in this library: keep every
  * aggregate in exact integers (longs / DECIMAL(38,0)) and spend
  * doubles only on ONE closed-form final expression per output row, so
  * a hash oracle replays the result bit-for-bit cross-engine.
  */
object Eval {

  /** Exact ROC-AUC of `scoreCol` against binary `labelCol` (0/1), via
    * the Mann-Whitney U statistic with full tie handling:
    *
    *   AUC = [ #{(p,n): s_p > s_n} + ½·#{(p,n): s_p = s_n} ] / (P·N)
    *
    * Plan shape — never a global per-row window:
    *  1. group by score value -> (pos, neg) per distinct score (the
    *     only corpus-sized shuffle, keyed by score);
    *  2. two-pass distributed prefix sum of `neg` in score order (the
    *     [[Packing.exclusivePrefixSum]] design, re-derived here for a
    *     DOUBLE key): linear range buckets, per-bucket totals windowed
    *     over <= numBuckets rows, broadcast back, per-bucket window;
    *  3. one exact DECIMAL(38,0) rollup of
    *     pos·(2·cumneg_before + neg) = 2U, then AUC = U / (P·N) as a
    *     single double division.
    *
    * 2U stays integral (the ½ tie term is pre-doubled), so the rollup
    * is order-independent; DECIMAL(38,0) because 2·P·N overflows a
    * long past ~2^31.5 rows per class. Returns ONE row
    * `(n_pos, n_neg, auc)`; `auc` is NULL when either class is empty.
    * Degenerate all-one-score input gives AUC = 0.5 by the tie term.
    */
  def aucScore(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      numBuckets: Int = 32
  ): DataFrame = {
    val cum = scoreCumulatives(df, scoreCol, labelCol, numBuckets)
    if (cum.isEmpty)
      return df.sparkSession.range(1).select(
        lit(0L).as("n_pos"), lit(0L).as("n_neg"),
        lit(null).cast("double").as("auc"))
    val dec = "decimal(38,0)"
    cum.get
      .agg(
        sum("__pos").as("n_pos"),
        sum("__neg").as("n_neg"),
        sum(col("__pos").cast(dec) *
          (col("__cumneg").cast(dec) * 2 + col("__neg").cast(dec))).as("__u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Shared prefix frame for the threshold-sweep family ([[aucScore]],
    * [[prCurve]], [[thresholdForPrecision]]): one row per distinct
    * score with `(__s, __pos, __neg, __cumpos, __cumneg)` where the
    * cumulatives count rows STRICTLY BELOW the score. None on empty
    * input. The distributed two-pass design documented on
    * [[aucScore]]; both cumulatives ride the same windows. */
  private def scoreCumulatives(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      numBuckets: Int
  ): Option[DataFrame] = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val lbl = col(labelCol).cast("long")
    // non-finite scores would floor to a NULL/saturated bucket id and
    // silently drop out of the offset join — exclude them like NaN
    val grouped = df
      .where(col(scoreCol).isNotNull && !isnan(col(scoreCol)) && lbl.isNotNull &&
        abs(col(scoreCol).cast("double")) < lit(Double.PositiveInfinity))
      .groupBy(col(scoreCol).cast("double").as("__s"))
      .agg(sum(lbl).as("__pos"), (count(lit(1)) - sum(lbl)).as("__neg"))
    val mm = grouped.agg(min(col("__s")), max(col("__s"))).head()
    if (mm.isNullAt(0)) return None
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    // span > 0 even when all scores coincide; bucket id clamps into range
    val span = math.max((hi - lo) / numBuckets, java.lang.Double.MIN_NORMAL)
    val bucketed = grouped.withColumn("__bucket",
      least(floor((col("__s") - lit(lo)) / lit(span)), lit(numBuckets - 1L))
        .cast("long"))
    val wb = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__bucket")
      .agg(sum("__pos").as("__ptotal"), sum("__neg").as("__ntotal"))
      .withColumn("__poffset", coalesce(sum("__ptotal").over(wb), lit(0L)))
      .withColumn("__noffset", coalesce(sum("__ntotal").over(wb), lit(0L)))
      .select("__bucket", "__poffset", "__noffset")
    val wi = Window.partitionBy("__bucket").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    Some(bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("__cumpos",
        col("__poffset") + coalesce(sum("__pos").over(wi), lit(0L)))
      .withColumn("__cumneg",
        col("__noffset") + coalesce(sum("__neg").over(wi), lit(0L)))
      .select("__s", "__pos", "__neg", "__cumpos", "__cumneg"))
  }

  /** Reliability-diagram bins for a probability-like `scoreCol` in
    * [0, 1] against binary `labelCol`: one row per occupied bin with
    * exact integer evidence (`n`, `n_pos`, `sum_score_micro` =
    * Σ floor(score·1e6)) plus the two rounded rates a calibration plot
    * reads off. Scores are clamped into [0, 1] first; bin = min(
    * floor(score·bins), bins-1) so score = 1.0 lands in the top bin.
    * One groupBy on <= `bins` keys — map-side combined, no window. */
  def calibrationBins(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10
  ): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val s = least(greatest(col(scoreCol).cast("double"), lit(0.0)), lit(1.0))
    val lbl = col(labelCol).cast("long")
    df.where(col(scoreCol).isNotNull && !isnan(col(scoreCol)) && lbl.isNotNull)
      .groupBy(least(floor(s * bins), lit(bins - 1L)).cast("long").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(lbl).as("n_pos"),
        sum(floor(s * 1e6).cast("long")).as("sum_score_micro"))
      .select(col("bin"), col("n"), col("n_pos"), col("sum_score_micro"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
        round(col("sum_score_micro").cast("double") / 1e6 / col("n"), 6)
          .as("avg_score"))
  }

  /** Precision/recall curve: one row per distinct score value t with
    * the exact confusion counts of the classifier "predict positive
    * when score >= t" — `(threshold, tp, fp, precision, recall, f1)`,
    * threshold-ascending. Built on the same [[scoreCumulatives]] frame
    * as [[aucScore]] (suffix counts = totals − strictly-below
    * cumulatives, so no second pass); the three ratios are each one
    * closed-form double over exact longs. `recall`/`f1` are NULL when
    * there are no positives. Row count = distinct scores — for a
    * continuous score at corpus scale, quantize the score first (the
    * calibration-bin move) to bound the curve. */
  def prCurve(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      numBuckets: Int = 32
  ): DataFrame = {
    val cum = scoreCumulatives(df, scoreCol, labelCol, numBuckets)
      .getOrElse(return df.sparkSession.range(0).select(
        lit(0.0).as("threshold"), lit(0L).as("tp"), lit(0L).as("fp"),
        lit(0.0).as("precision"), lit(0.0).as("recall"), lit(0.0).as("f1")))
    val totals = cum.agg(sum("__pos").as("__P"), sum("__neg").as("__N"))
    val tp = col("__P") - col("__cumpos")
    val fp = col("__N") - col("__cumneg")
    cum.crossJoin(broadcast(totals))
      .select(col("__s").as("threshold"), tp.as("tp"), fp.as("fp"),
        round(tp.cast("double") / (tp + fp), 6).as("precision"),
        when(col("__P") > 0, round(tp.cast("double") / col("__P"), 6)).as("recall"),
        when(col("__P") > 0,
          round(lit(2.0) * tp / (tp + fp + col("__P")), 6)).as("f1"))
  }

  /** Average precision (the area under the PR curve, step-wise /
    * sklearn-style): AP = Σ_t (R_t − R_prev) · P_t over thresholds in
    * descending-score order, which over tie groups is exactly
    *
    *   AP = (1/P) · Σ_g pos_g · tp_g / sel_g
    *
    * with tp/sel the suffix confusion counts at group g — every factor
    * an exact long off the shared [[scoreCumulatives]] frame. Each
    * group's double term is quantized once (`floor(term·1e9)`) so the
    * rollup is an order-independent integer sum, then ONE division by
    * P·1e9. Returns `(n_pos, n_neg, average_precision)`; NULL when
    * there are no positives. The single-number ranking-quality summary
    * to [[prCurve]]'s full table — AUC's class-imbalance-robust
    * sibling. */
  def averagePrecision(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      numBuckets: Int = 32
  ): DataFrame = {
    val empty = df.sparkSession.range(1).select(
      lit(0L).as("n_pos"), lit(0L).as("n_neg"),
      lit(null).cast("double").as("average_precision"))
    val cum = scoreCumulatives(df, scoreCol, labelCol, numBuckets)
      .getOrElse(return empty)
    val totals = cum.agg(sum("__pos").as("__P"), sum("__neg").as("__N"))
    val tp = col("__P") - col("__cumpos")
    val sel = tp + (col("__N") - col("__cumneg"))
    cum.crossJoin(broadcast(totals))
      .select(col("__P"), col("__N"),
        floor(col("__pos") * tp.cast("double") / sel * 1e9).cast("long")
          .as("__term"))
      .groupBy()
      .agg(first("__P").as("n_pos"), first("__N").as("n_neg"),
        sum("__term").as("__ap"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0,
          round(col("__ap").cast("double") / 1e9 / col("n_pos"), 6))
          .as("average_precision"))
  }

  /** Deployment-threshold picker: the SMALLEST score threshold whose
    * "predict positive when score >= t" precision meets
    * `targetPrecision` — smallest because precision is not monotone
    * and the smallest satisfying t keeps the most recall. The compare
    * is exact integer arithmetic (tp·1e6 >= round(target·1e6)·selected
    * in DECIMAL — no float comparison decides the gate), the argmin is
    * a map-side-combined `min(struct)`. Returns ONE row `(threshold,
    * tp, selected, precision)`, all NULL when no threshold attains the
    * target. */
  def thresholdForPrecision(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      targetPrecision: Double,
      numBuckets: Int = 32
  ): DataFrame = {
    require(targetPrecision >= 0.0 && targetPrecision <= 1.0,
      s"targetPrecision must be in [0, 1], got $targetPrecision")
    val tMicro = math.round(targetPrecision * 1e6)
    val empty = df.sparkSession.range(1).select(
      lit(null).cast("double").as("threshold"), lit(null).cast("long").as("tp"),
      lit(null).cast("long").as("selected"),
      lit(null).cast("double").as("precision"))
    val cum = scoreCumulatives(df, scoreCol, labelCol, numBuckets)
      .getOrElse(return empty)
    val totals = cum.agg(sum("__pos").as("__P"), sum("__neg").as("__N"))
    val dec = "decimal(38,0)"
    val tp = col("__P") - col("__cumpos")
    val sel = tp + (col("__N") - col("__cumneg"))
    cum.crossJoin(broadcast(totals))
      .select(col("__s"), tp.as("__tp"), sel.as("__sel"))
      .where(col("__tp").cast(dec) * 1000000 >= col("__sel").cast(dec) * tMicro)
      .agg(min(struct(col("__s"), col("__tp"), col("__sel"))).as("__w"))
      .select(col("__w.__s").as("threshold"), col("__w.__tp").as("tp"),
        col("__w.__sel").as("selected"),
        round(col("__w.__tp").cast("double") / col("__w.__sel"), 6).as("precision"))
  }

  /** Expected calibration error over [[calibrationBins]]' bins, kept
    * EXACT until the last step: per bin,
    * |pos_rate − avg_score| · n/N = |pos·1e6 − sum_score_micro| / (1e6·N),
    * so ECE = Σ_b |pos_b·1e6 − micro_b| / (1e6·N) — an integer-absolute
    * rollup over <= `bins` rows and ONE double division. Returns one row
    * `(n, ece)`; NULL on empty input. */
  def calibrationEce(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10
  ): DataFrame =
    calibrationBins(df, scoreCol, labelCol, bins)
      .agg(sum("n").as("__n"),
        sum(abs(col("n_pos") * lit(1000000L) - col("sum_score_micro")))
          .as("__num"))
      .select(coalesce(col("__n"), lit(0L)).as("n"),
        when(col("__n") > 0,
          round(col("__num").cast("double") / 1e6 / col("__n"), 6)).as("ece"))

  /** Per-group [[aucScore]]: one AUC row per value of `groupCol` — the
    * stratified eval (per-language, per-source) that catches a scorer
    * good on the majority slice and broken on a minority one. Same
    * arithmetic contract as the global AUC; the prefix machinery
    * partitions by (group, bucket) with GLOBAL score-range buckets (a
    * skewed group only costs balance, never correctness), and the
    * bucket-offset table is one compact (groups × buckets)-row window
    * partitioned by group. The offsets join is broadcast-hinted ONLY
    * when the group cardinality is measured small (an
    * approx_count_distinct rides the existing min/max job, so the
    * check is free): group cardinality is caller-controlled and
    * unbounded — per-source grouping can reach millions — and a forced
    * broadcast there would blow the driver where the plain shuffle
    * join degrades gracefully (and AQE may still pick broadcast at
    * runtime from actual sizes). */
  def aucScoreBy(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      labelCol: String,
      numBuckets: Int = 32
  ): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val lbl = col(labelCol).cast("long")
    val grouped = df
      .where(col(scoreCol).isNotNull && !isnan(col(scoreCol)) && lbl.isNotNull &&
        abs(col(scoreCol).cast("double")) < lit(Double.PositiveInfinity))
      .groupBy(col(groupCol).as("__g"), col(scoreCol).cast("double").as("__s"))
      .agg(sum(lbl).as("__pos"), (count(lit(1)) - sum(lbl)).as("__neg"))
    val mm = grouped.agg(min(col("__s")), max(col("__s")),
      approx_count_distinct(col("__g")).as("__ng")).head()
    if (mm.isNullAt(0))
      return grouped.select(col("__g").as(groupCol), lit(0L).as("n_pos"),
        lit(0L).as("n_neg"), lit(null).cast("double").as("auc")).limit(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val nGroupsApprox = mm.getLong(2)
    val span = math.max((hi - lo) / numBuckets, java.lang.Double.MIN_NORMAL)
    val bucketed = grouped.withColumn("__bucket",
      least(floor((col("__s") - lit(lo)) / lit(span)), lit(numBuckets - 1L))
        .cast("long"))
    val wb = Window.partitionBy("__g").orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__g", "__bucket")
      .agg(sum("__neg").as("__btotal"))
      .withColumn("__boffset", coalesce(sum("__btotal").over(wb), lit(0L)))
      .select("__g", "__bucket", "__boffset")
    val wi = Window.partitionBy("__g", "__bucket").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val dec = "decimal(38,0)"
    // broadcast ONLY when the offsets table is measured small (~1M
    // (group, bucket, long) rows ≈ tens of MB): group cardinality is
    // unbounded, and forcing broadcast at millions of groups blows the
    // driver where a shuffle join (or AQE's own runtime broadcast
    // decision) degrades gracefully
    val offsetsHinted =
      if (nGroupsApprox * numBuckets <= (1L << 20)) broadcast(offsets) else offsets
    bucketed.join(offsetsHinted, Seq("__g", "__bucket"))
      .withColumn("__cumneg",
        col("__boffset") + coalesce(sum("__neg").over(wi), lit(0L)))
      .groupBy("__g")
      .agg(
        sum("__pos").as("n_pos"),
        sum("__neg").as("n_neg"),
        sum(col("__pos").cast(dec) *
          (col("__cumneg").cast(dec) * 2 + col("__neg").cast(dec))).as("__u2"))
      .select(col("__g").as(groupCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Greedy token-budget selection: walk documents in (`scoreCol`
    * DESC, `idCol` ASC) order and keep every row that fits ENTIRELY
    * inside the remaining budget of the running `costCol` prefix sum —
    * "take the best docs until the token budget is spent", the final
    * cut of a curation pipeline. Emits the kept rows with their
    * exclusive `offset` (tokens consumed before this doc).
    *
    * Distributed like [[Packing.exclusivePrefixSum]] but keyed on the
    * SCORE range (descending; ties stay in one bucket because the
    * bucket is a function of the score alone) — and with a
    * budget-prune the packing twin can't do: buckets whose exclusive
    * offset already exceeds the budget are dropped BEFORE their
    * per-bucket window runs, so the window only touches the winning
    * prefix of the corpus, not all of it. `idCol` must be unique (the
    * deterministic tiebreak). */
  def budgetSelect(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      costCol: String,
      budget: Long,
      numBuckets: Int = 32
  ): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val base = df.where(col(scoreCol).isNotNull && !isnan(col(scoreCol)) &&
      abs(col(scoreCol).cast("double")) < lit(Double.PositiveInfinity))
    val mm = base.agg(
      min(col(scoreCol).cast("double")), max(col(scoreCol).cast("double"))).head()
    if (mm.isNullAt(0)) return base.withColumn("offset", lit(0L)).limit(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val span = math.max((hi - lo) / numBuckets, java.lang.Double.MIN_NORMAL)
    // the bucket prune below is only sound for non-negative costs —
    // fail loudly instead of silently under-selecting; a NULL cost is
    // the same contract violation (it would silently vanish from the
    // prefix sums and the fit test), so it raises too
    val cost = when(col(costCol).isNull,
      raise_error(lit(s"Eval.budgetSelect: null $costCol"))
    ).when(col(costCol) < 0,
      raise_error(lit(s"Eval.budgetSelect: negative $costCol"))
    ).otherwise(col(costCol)).cast("long")
    // bucket 0 = best scores, so bucket order IS selection order
    val bucketed = base.withColumn("__bucket",
      least(floor((lit(hi) - col(scoreCol).cast("double")) / lit(span)),
        lit(numBuckets - 1L)).cast("long"))
    val wb = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__bucket")
      .agg(sum(cost).as("__btotal"))
      .withColumn("__boffset", coalesce(sum("__btotal").over(wb), lit(0L)))
      // the prune: a bucket starting PAST the budget cannot contribute a
      // fitting row (costs are checked non-negative). `<=` not `<`: a
      // zero-cost row whose exclusive offset equals the budget exactly
      // still satisfies `offset + cost <= budget` and must be kept —
      // the documented (and oracle) semantics.
      .where(col("__boffset") <= budget)
      .select("__bucket", "__boffset")
    val wi = Window.partitionBy("__bucket")
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("offset",
        col("__boffset") + coalesce(sum(cost).over(wi), lit(0L)))
      .where(col("offset") + cost <= budget)
      .drop("__bucket", "__boffset")
  }

  /** Corpus-level pairwise overlap between sources: exact n-gram
    * Jaccard between each pair of sources' distinct-shingle SETS —
    * "how much does crawl A duplicate crawl B", the mixture-design
    * input that decides whether two sources are worth keeping both of.
    *
    * Scale shape: the corpus-sized work is ONE distinct on (source,
    * shingle) — after it, every shingle carries at most S = #sources
    * rows, so the shingle-keyed self-join fans out at most C(S, 2)
    * pairs per shingle regardless of how hot the shingle is across
    * documents (the hot-shingle skew that forces `maxDf` in the
    * DOC-level pair operators structurally cannot occur here). The
    * pair rollup then holds <= C(S, 2) rows. Disjoint pairs are kept
    * with n_common = 0 via a broadcast self-join of the S-row size
    * table. S is assumed small (sources, not documents); the plan is
    * linear in corpus size and quadratic only in S. */
  def sourceOverlap(
      df: DataFrame,
      srcCol: String,
      textCol: String,
      n: Int = 3
  ): DataFrame = {
    val perSrc = df
      .select(col(srcCol).as("__src"),
        explode(Dedup.shingleSet(col(textCol), n)).as("__sh"))
      .distinct()
    val sizes = perSrc.groupBy("__src").agg(count(lit(1)).as("__sz"))
    val inter = perSrc.as("a")
      .join(perSrc.as("b"),
        col("a.__sh") === col("b.__sh") && col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("src_a"), col("b.__src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    val allPairs = broadcast(sizes.as("sa"))
      .join(broadcast(sizes.as("sb")), col("sa.__src") < col("sb.__src"))
      .select(col("sa.__src").as("src_a"), col("sb.__src").as("src_b"),
        col("sa.__sz").as("size_a"), col("sb.__sz").as("size_b"))
    allPairs.join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("size_a"), col("size_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("size_a") + col("size_b") - coalesce(col("n_common"), lit(0L))),
          6).as("jaccard"))
  }
}
