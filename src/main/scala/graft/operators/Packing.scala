package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: lay documents end to end in a
  * deterministic order and chunk the concatenated token stream into
  * fixed-budget packs (context windows). Every doc gets its global token
  * `offset`, its `pack_id` = offset / budget, and `pack_offset` = its
  * position inside the pack — the concat-then-chunk scheme (documents may
  * straddle pack boundaries), which is the shape large pretraining
  * pipelines actually use. The greedy reset-the-counter bin packing
  * variant is an inherently sequential fold and does not distribute; this
  * scheme is a pure prefix sum and does.
  *
  * The global ordered prefix sum deliberately avoids the classic
  * `Window.orderBy(id)` formulation, which funnels the whole corpus
  * through ONE task. [[exclusivePrefixSum]] is the two-pass distributed
  * form (the same design as the tree trainer's partitioned cumulative
  * counts): order-preserving linear bucketing on the id range, per-bucket
  * totals windowed into exclusive bucket offsets (numBuckets rows, driver
  * cheap), broadcast back, then a per-bucket window whose partition is
  * 1/numBuckets of the data. At 100 TB, size numBuckets so a bucket's
  * rows fit one task comfortably.
  */
object Packing {

  /** Exclusive prefix sum of `valueCol` in `orderCol` order, distributed:
    * adds `offset` = sum of values of all rows strictly before this row.
    * `orderCol` must be numeric and unique (document ids). */
  def exclusivePrefixSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      numBuckets: Int = 32
  ): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val mm = df.agg(
      min(col(orderCol)).cast("long").as("lo"),
      max(col(orderCol)).cast("long").as("hi")).head()
    if (mm.isNullAt(0)) return df.withColumn("offset", lit(0L)).limit(0)
    val lo = mm.getLong(0)
    val hi = mm.getLong(1)
    // order-preserving linear bucket id; span sized so bucket ids stay in
    // [0, numBuckets) across the full key range
    val span = math.max(1L, (hi - lo) / numBuckets + 1)
    val bucketed = df.withColumn("__bucket",
      ((col(orderCol).cast("long") - lit(lo)) / lit(span)).cast("long"))
    val totals = bucketed.groupBy("__bucket")
      .agg(sum(col(valueCol).cast("long")).as("__btotal"))
    // numBuckets rows: the unpartitioned window is bounded and cheap
    val wb = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__boffset", coalesce(sum("__btotal").over(wb), lit(0L)))
      .select("__bucket", "__boffset")
    val wi = Window.partitionBy("__bucket").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("offset",
        col("__boffset") + coalesce(sum(col(valueCol).cast("long")).over(wi), lit(0L)))
      .drop("__bucket", "__boffset")
  }

  /** Assign each document its pack: `pack_id` = which context window its
    * first token lands in, `pack_offset` = where inside that window.
    * `tokenCol` is the document's token count (see
    * [[graft.functions.TextFunctions.wsTokenCount]]). */
  def packByBudget(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      numBuckets: Int = 32
  ): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    exclusivePrefixSum(df, idCol, tokenCol, numBuckets)
      .withColumn("pack_id", floor(col("offset") / lit(budget)).cast("long"))
      .withColumn("pack_offset", col("offset") % lit(budget))
  }

  /** Per-pack manifest from a [[packByBudget]] result: the ORDERED
    * document list and within-pack boundary offsets —
    * `(pack_id, n_docs, total_tokens, doc_ids, doc_offsets)`. This is
    * the artifact a pretraining data loader consumes to build per-pack
    * attention masks (tokens must not attend across the document
    * boundaries the offsets mark). One pack-keyed aggregate; rows per
    * pack are bounded by budget/min-doc-tokens, so the per-group
    * collect_list state is bounded by the context window, not the
    * corpus. Arrays are pack_offset-sorted in-plan (array_sort on the
    * (offset, id) struct), deterministic under any partitioning. */
  def packManifest(packed: DataFrame, idCol: String = "doc_id"): DataFrame =
    packed
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        array_sort(collect_list(struct(col("pack_offset"), col(idCol))))
          .as("__entries"))
      .select(col("pack_id"), col("n_docs"), col("total_tokens"),
        transform(col("__entries"), e => e.getField(idCol)).as("doc_ids"),
        transform(col("__entries"), e => e.getField("pack_offset")).as("doc_offsets"))
}
