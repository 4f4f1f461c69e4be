package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking and deterministic sampling — the two remaining
  * mechanical stages of an embedding/pretraining prep pipeline.
  *
  * [[chunk]] splits each document into fixed-token windows with overlap
  * (stride = chunkTokens - overlapTokens), the shape embedding and RAG
  * pipelines feed to encoders. Pure per-row column algebra: tokenize
  * once, explode a window-index sequence, slice + rejoin — no shuffle at
  * all until the caller aggregates, and the row multiplier is
  * ceil(n_tokens / stride), bounded by design.
  *
  * [[sampleByHash]] is deterministic content-hash sampling: a row
  * survives iff the first 4 md5 hex chars of its id, read as an integer,
  * fall under rate * 0xffff. Unlike `DataFrame.sample` (RNG per
  * partition, non-reproducible across layouts/retries) the decision is a
  * pure function of the ROW, so the sample is stable across cluster
  * layouts, re-runs, and engines — which is also what makes it
  * oracle-checkable and what makes weighted corpus mixtures (different
  * rates per source) reproducible at 100 TB.
  */
object Chunking {

  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlapTokens: Int = 0
  ): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = split(regexp_replace(trim(col(textCol)), "\\s+", " "), " ")
    val n = when(length(trim(col(textCol))) === 0, lit(0)).otherwise(size(toks))
    // windows start at 0, stride, 2*stride, ...; the count is
    // max(1, ceil((n - overlap) / stride)) — NOT ceil(n / stride), which
    // would add a final window of <= overlapTokens tokens that is a pure
    // subset of the previous chunk (duplicate content in the corpus).
    // Coverage still holds: the last window's start + chunkTokens >= n.
    val nChunks = when(n === 0, lit(0)).otherwise(
      greatest(lit(1),
        ceil((n - lit(overlapTokens)).cast("double") / stride).cast("int")))
    // sequence(0, -1) throws (start > stop needs a negative step), so an
    // empty document maps to an explicit empty index array — explode then
    // drops the row, i.e. empty docs yield zero chunks
    val idxSeq = when(nChunks > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), toks.as("__toks"), n.as("__n"),
        explode(idxSeq).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        array_join(slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("chunk_idx") * stride).as("chunk_tokens"))
  }

  /** Survival decision for [[sampleByHash]] as a reusable predicate:
    * (first 4 md5 hex chars of the id as int) < rate * 65536. */
  def hashSamplePredicate(idCol: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    conv(substring(md5(idCol.cast("string").cast("binary")), 1, 4), 16, 10).cast("int") <
      lit((rate * 65536).toInt)
  }

  def sampleByHash(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.where(hashSamplePredicate(col(idCol), rate))

  /** Weighted corpus mixture: per-stratum deterministic rates (e.g.
    * lang -> rate), unmatched strata dropped. Rates may exceed 1 —
    * real corpus mixtures UPWEIGHT rare languages/domains: a row in a
    * stratum with rate r yields floor(r) guaranteed copies plus one
    * fractional copy iff its id-hash falls under frac(r) (the same
    * threshold as downsampling, so r <= 1 reproduces the pure-filter
    * semantics row for row). Output rows carry `sample_copy` in
    * [0, copies) so downstream stages (shuffling, packing) can
    * distinguish repetitions. Everything is a pure function of
    * (id, stratum): reproducible across engines/layouts/retries, and
    * the row multiplier is bounded by max(rates) — a narrow
    * filter+explode, no shuffle. */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double]
  ): DataFrame = {
    require(rates.nonEmpty, "mixtureSample: empty rate map")
    rates.foreach { case (s, r) =>
      require(r >= 0 && !r.isNaN && !r.isInfinite,
        s"mixtureSample: rate for '$s' must be finite and >= 0, got $r")
    }
    val nCopies = rates.foldLeft(lit(0)) { case (acc, (stratum, rate)) =>
      val whole = math.floor(rate).toInt
      val frac = rate - whole
      val extra =
        if (frac > 0) when(hashSamplePredicate(col(idCol), frac), 1).otherwise(0)
        else lit(0)
      when(col(stratumCol) === lit(stratum), lit(whole) + extra).otherwise(acc)
    }
    // sequence(0, -1) throws, so zero copies maps to an explicit empty
    // array — explode then drops the row (the chunk() move)
    val copySeq = when(nCopies > 0, sequence(lit(0), nCopies - 1))
      .otherwise(array().cast("array<int>"))
    df.withColumn("sample_copy", explode(copySeq))
  }

  /** Temperature-scaled mixture weights — the step UPSTREAM of
    * [[mixtureSample]]: computes each stratum's sampling weight
    * proportional to `count^alpha` (alpha-smoothed multinomial mixing,
    * the XLM-R / GPT-3 recipe for upweighting rare languages/domains;
    * alpha = 1 reproduces natural proportions, alpha -> 0 uniform).
    *
    * Determinism contract: the default `alpha = 0.5` uses `sqrt` — the
    * one power IEEE 754 requires correctly rounded, so Spark and the
    * DuckDB oracle agree bit-for-bit — and the score is quantized
    * BEFORE the ratio: `s = floor(sqrt(n) * 1e6)` as a long, then
    * `weight_micro = s * 1e6 div sum(s)` in pure integer arithmetic
    * (overflow-safe to ~1e12 docs per stratum). Other alphas are
    * accepted but go through libm `pow`, whose last ulp differs across
    * engines — round-tolerance territory, not exact-hash.
    *
    * Scale shape: one map-side-combined count aggregate (rows = strata),
    * then a 1-row broadcast total — nothing corpus-sized moves. */
  def temperatureWeights(
      df: DataFrame,
      stratumCol: String,
      alpha: Double = 0.5
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
    val score = if (alpha == 0.5) sqrt(col("n_docs")) else pow(col("n_docs"), lit(alpha))
    val scored = counts.withColumn("__s", floor(score * lit(1000000.0)).cast("long"))
    val tot = scored.agg(sum("__s").as("__tot"))
    scored.crossJoin(broadcast(tot))
      .select(col(stratumCol), col("n_docs"),
        expr("(__s * 1000000L) div __tot").as("weight_micro"))
  }
}
