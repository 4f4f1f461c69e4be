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

  /** Weighted corpus mixture: per-stratum deterministic sampling rates
    * (e.g. lang -> rate), unmatched strata dropped. One narrow filter —
    * the mixture is a pure function of (id, stratum), reproducible
    * anywhere. */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double]
  ): DataFrame = {
    require(rates.nonEmpty, "mixtureSample: empty rate map")
    val pred = rates.foldLeft(lit(false)) { case (acc, (stratum, rate)) =>
      acc || (col(stratumCol) === lit(stratum) &&
        hashSamplePredicate(col(idCol), rate))
    }
    df.where(pred)
  }
}
