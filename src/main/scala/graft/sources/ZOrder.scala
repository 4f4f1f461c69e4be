package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering for multi-dimensional scan
  * pruning — the lakehouse layout trick (public: Morton 1966; Delta/
  * Iceberg OPTIMIZE ZORDER): interleave the bits of several columns into
  * one sort key so that sorting by it co-locates rows that are close in
  * EVERY dimension. Parquet keeps per-row-group min/max stats per
  * column; after a z-ordered write, a predicate on ANY of the z-ordered
  * dimensions (not just the leading sort column) maps to a small set of
  * row groups, and the pushed-down filter skips the rest at scan time.
  * A plain `ORDER BY a` layout prunes on `a` only — predicates on `b`
  * overlap every row group.
  *
  * Everything is plain codegen'd column arithmetic (shift/and/or folds —
  * no UDF, no custom expression needed), so the z-value computation runs
  * at scan speed, and the write is `repartitionByRange(zv) +
  * sortWithinPartitions(zv)` — the range exchange is sampled (no
  * single-task global sort), the standard distributed total-order write.
  *
  * ZOrderSpec verifies the claim mechanically: it reads BOTH layouts'
  * parquet footers and counts row groups whose [min, max] envelope
  * overlaps a 2-D box predicate — the z-ordered layout must overlap a
  * fraction where the single-column sort overlaps ~all for the
  * non-leading dimension.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each (already `[0, 2^bits)`
    * integer-scaled) column into a Morton code: bit `b` of dimension
    * `d` lands at position `b * D + d`. `bits * cols.size` must stay
    * under 63 (sign-safe long). */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits * dims must be in [1, 63], got ${bits * cols.size}")
    val d = cols.size
    cols.zipWithIndex.map { case (c, di) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * d + di)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Min-max scale a numeric column to the `[0, 2^bits)` integer grid
    * (clamped; degenerate min==max maps to 0). `lo`/`hi` are the
    * dimension's bounds — pass literals when known, or the values from a
    * tiny bounds aggregate. */
  def scaled(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val cells = (1L << bits).toDouble
    val idx = floor((c - lo).cast("double") / (hi - lo).cast("double") * cells)
    least(lit((1L << bits) - 1), greatest(lit(0L),
      when(hi <= lo, lit(0L)).otherwise(idx.cast("long"))))
  }

  /** Write `df` to parquet z-ordered on `dims` (numeric columns):
    * computes per-dimension bounds in one tiny aggregate, scales each
    * dimension to the `bits` grid, range-partitions by the interleaved
    * z-value into `numFiles` sorted files. The z-value is layout-only —
    * it is not written. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dims: Seq[String],
      bits: Int = 8,
      numFiles: Int = 8,
      rowGroupBytes: Option[Long] = None
  ): Unit = {
    require(dims.nonEmpty, "at least one z-order dimension")
    val aggCols = dims.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"__lo$i"),
        max(col(c)).cast("double").as(s"__hi$i"))
    }
    val bounds = df.agg(aggCols.head, aggCols.tail: _*)
    val z = zValue(dims.zipWithIndex.map { case (c, i) =>
      scaled(col(c), col(s"__lo$i"), col(s"__hi$i"), bits)
    }, bits)
    val writer = df.crossJoin(broadcast(bounds))
      .withColumn("__zv", z)
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions("__zv")
      .select(df.columns.map(col).toIndexedSeq: _*)
      .write.mode("overwrite")
    rowGroupBytes.fold(writer)(b => writer.option("parquet.block.size", b))
      .parquet(path)
  }
}
