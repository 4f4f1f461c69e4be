package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005, public) as relational
  * algebra — the "estimate ANY key's frequency in bounded memory"
  * companion to the Misra-Gries heavy-hitters aggregate (which only
  * tracks the top keys): `depth` hash rows of `width` counters; an item's
  * estimate is the MIN of its `depth` counter cells, always >= the true
  * count, and over by more than `e*N/width` with probability below
  * `(1/e)^depth` per query.
  *
  * Scale shape: the BUILD is one exploded projection (`depth` cells per
  * item) into a map-side-combined `groupBy(row, bucket).count()` — the
  * shuffle carries at most `depth * width` rows per map task regardless
  * of corpus size, the same bounded-table discipline as the DSIR n-gram
  * models. The resulting sketch TABLE (<= depth*width rows) broadcasts
  * onto probes; estimating a batch of keys is a broadcast left-join +
  * `min` aggregate, no corpus access at all. Hashes are
  * `xxhash64(row_index, item)` — deterministic, partitioning-free.
  */
object CountMin {

  /** The sketch: one row per non-empty counter cell,
    * `(row, bucket, cnt)`, at most `depth * width` rows. */
  def sketch(
      items: DataFrame,
      itemCol: String,
      depth: Int = 4,
      width: Int = 4096
  ): DataFrame = {
    requireDims(depth, width)
    items
      .where(col(itemCol).isNotNull)
      .select(posexplode(cellArray(col(itemCol), depth, width))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `queries` (any frame with `itemCol`): input
    * columns plus `est`. The sketch side is `broadcast()` (bounded at
    * `depth * width` rows); keys never inserted estimate the true 0 only
    * if all their cells are empty, else the usual CMS overcount. */
  def estimates(
      cms: DataFrame,
      queries: DataFrame,
      itemCol: String,
      depth: Int = 4,
      width: Int = 4096
  ): DataFrame = {
    requireDims(depth, width)
    val outCols = queries.columns.toIndexedSeq
    val probed = queries
      .select(outCols.map(col) :+
        posexplode(cellArray(col(itemCol), depth, width))
          .as(Seq("row", "bucket")): _*)
    probed
      .join(broadcast(cms), Seq("row", "bucket"), "left")
      .groupBy(outCols.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** The `depth` (row, bucket) cells of one item as an array column —
    * shared with the streaming twin so batch and stream hash
    * identically. */
  private[graft] def cellArray(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(i => cell(item, i, width)): _*)

  private def cell(item: Column, row: Int, width: Int): Column =
    pmod(xxhash64(lit(row), item), lit(width.toLong))

  private def requireDims(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
  }
}
