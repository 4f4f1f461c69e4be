package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling — the table-statistics primitive a
  * lakehouse catalog publishes per snapshot (row counts, null rates,
  * cardinalities, value bounds) and the first thing a pipeline author
  * asks of an unfamiliar 100 TB table. Exact by default: these numbers
  * feed data-quality GATES (a null-rate regression fails a delivery),
  * where sketch error bars are the wrong trade — the approximate
  * cardinality family (HLL / `group_distinct_approx`) already covers
  * the monitoring side.
  *
  * Scale shape: ONE aggregation pass. `count(distinct col)` for several
  * columns makes Catalyst plan its Expand-based multi-distinct — input
  * rows replicate once per profiled column before the partial
  * aggregates, so the shuffle carries O(n_cols * distinct values)
  * rows. That is the exact-answer floor; profile the columns you gate
  * on, not all 190. Bounds are emitted as strings so one output schema
  * covers heterogeneous columns; the profiled columns must be
  * string-cast-stable across engines (integers/strings — doubles
  * format differently in Spark vs SQL engines and belong in typed
  * per-column queries, not this generic surface).
  */
object Profile {

  /** One row per profiled column: `(column, n_rows, n_null, n_distinct,
    * min_value, max_value)` — n_distinct is EXACT and excludes NULL
    * (SQL `count(distinct)` semantics); bounds are null on all-null
    * columns. Output ordered by column name. */
  def columns(df: DataFrame, profileCols: Seq[String]): DataFrame = {
    require(profileCols.nonEmpty, "profileCols must be non-empty")
    val missing = profileCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    // everything below is Column-API only, with POSITIONAL internal
    // aliases — a raw delivery's column names (spaces, dots, quotes,
    // hyphens) never reach a SQL string or an alias, so they can't
    // break parsing or mis-resolve; source columns resolve through
    // df(name), which treats the name literally
    val aggs = profileCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(df(c)).as(s"__nn_$i"),
        countDistinct(df(c)).as(s"__nd_$i"),
        min(df(c)).cast("string").as(s"__mn_$i"),
        max(df(c)).cast("string").as(s"__mx_$i"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the single wide row into one row per profiled column
    val perCol = profileCols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$i")).as("n_null"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__mn_$i").as("min_value"),
        col(s"__mx_$i").as("max_value"))
    }
    wide.select(explode(array(perCol: _*)).as("__p"))
      .select(col("__p.*"))
      .orderBy("column_name")
  }

  /** Profile drift between two snapshots of the same table — the
    * delivery-acceptance gate a lakehouse runs on every re-delivery:
    * a null-rate jump, a cardinality collapse, or moved value bounds
    * on a gated column fails the drop before any downstream job reads
    * it (the [[SnapshotDiff]] row-level story at column granularity).
    *
    * One row per profiled column: both snapshots' exact metrics side
    * by side plus integer deltas (`new - old`) and a null-safe
    * `bounds_changed` flag. Scale shape: one [[columns]] pass per
    * snapshot (each a single aggregation — see that scaladoc for the
    * Expand floor), then a join of two n_cols-row frames — the
    * comparison itself is driver-trivial by construction. */
  def drift(
      oldDf: DataFrame,
      newDf: DataFrame,
      profileCols: Seq[String]
  ): DataFrame = {
    val o = columns(oldDf, profileCols)
    val n = columns(newDf, profileCols)
    def pref(df: DataFrame, p: String): DataFrame =
      df.select(col("column_name") +:
        df.columns.filter(_ != "column_name").map(c => col(c).as(s"$p$c")).toIndexedSeq: _*)
    pref(o, "old_").join(pref(n, "new_"), Seq("column_name"))
      .select(col("column_name"),
        col("old_n_rows"), col("new_n_rows"),
        (col("new_n_rows") - col("old_n_rows")).as("rows_delta"),
        col("old_n_null"), col("new_n_null"),
        (col("new_n_null") - col("old_n_null")).as("null_delta"),
        col("old_n_distinct"), col("new_n_distinct"),
        (col("new_n_distinct") - col("old_n_distinct")).as("distinct_delta"),
        (not(col("old_min_value") <=> col("new_min_value")) ||
          not(col("old_max_value") <=> col("new_max_value"))).as("bounds_changed"))
      .orderBy("column_name")
  }
}
