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
}
