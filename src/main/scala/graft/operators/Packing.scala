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
}
