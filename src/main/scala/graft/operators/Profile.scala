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

  /** Population stability index between two snapshots of a numeric
    * column — the DISTRIBUTIONAL drift gate [[drift]]'s exact-bounds
    * flags can't express (a column whose min/max/nulls hold steady can
    * still migrate mass between the middle bins). One row per bin:
    * `(bin, n_old, n_new, psi_term_micro)`; Σ psi_term_micro / 1e12 is
    * the PSI (industry rule of thumb: > 0.1 investigate, > 0.25 act) —
    * [[psiTotal]] does that rollup.
    *
    * Binning: `bins` equal-width buckets over the OLD snapshot's
    * [min, max] (two driver scalars — the reference frame stays fixed
    * so the number means the same thing release over release); new
    * values outside the old range clamp into the edge bins, which is
    * exactly where a range excursion should register. Every bin 0..
    * bins-1 is emitted (a bin both snapshots miss still carries the
    * Laplace-smoothing term).
    *
    * Exactness: per-bin Laplace probabilities p = (c_old+1)/(N_old+bins),
    * q = (c_new+1)/(N_new+bins); the term (p−q)·ln(p/q) is ONE
    * closed-form double per bin over exact integer counts, quantized
    * once to `floor(term·1e12)` — so the total is an exact integer sum,
    * order-independent and engine-replayable (each term is >= 0, so
    * quantization under-counts by < bins/1e12). NULLs are excluded from
    * both counts (they are [[drift]]'s `null_delta` signal, not a bin).
    *
    * Scale shape: two scan-speed single-pass bin aggregates (<= bins
    * keys, map-side combined), a bins-row outer join against a
    * `spark.range(bins)` spine, zero corpus-sized shuffles. */
  def psi(
      oldDf: DataFrame,
      newDf: DataFrame,
      valueCol: String,
      bins: Int = 10
  ): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    // the reference frame must come from FINITE old values only: one NaN
    // reaching max() poisons the span (NaN sorts above every double in
    // Spark aggregates) and every bin expression degenerates — the drift
    // gate would silently report ~zero drift on exactly the dirty input
    // it exists to catch. Infinities are excluded for the same reason
    // (an infinite span maps all finite mass to bin 0); they still
    // register downstream, clamped into the edge bins like any other
    // out-of-range excursion.
    val vd = col(valueCol).cast("double")
    val mm = oldDf
      .where(vd.isNotNull && !isnan(vd) && abs(vd) < lit(Double.PositiveInfinity))
      .agg(min(vd), max(vd)).head()
    require(!mm.isNullAt(0),
      s"Profile.psi: old snapshot has no finite $valueCol rows")
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val span = math.max((hi - lo) / bins, java.lang.Double.MIN_NORMAL)
    def binned(df: DataFrame, cnt: String): DataFrame = df
      .where(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .groupBy(least(greatest(
          floor((col(valueCol).cast("double") - lit(lo)) / lit(span)), lit(0L)),
        lit(bins - 1L)).cast("long").as("bin"))
      .agg(count(lit(1)).as(cnt))
    val spine = oldDf.sparkSession.range(bins).select(col("id").as("bin"))
    // bins rows, eagerly materialized: the totals rollup and the term
    // projection both read it, and recomputing would re-scan both
    // snapshots
    val joined = spine
      .join(binned(oldDf, "__o"), Seq("bin"), "left")
      .join(binned(newDf, "__n"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("__o"), lit(0L)).as("n_old"),
        coalesce(col("__n"), lit(0L)).as("n_new"))
      .localCheckpoint(true)
    val totals = joined.agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    val p = (col("n_old") + 1).cast("double") / (col("__to") + bins)
    val q = (col("n_new") + 1).cast("double") / (col("__tn") + bins)
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_old"), col("n_new"),
        floor((p - q) * log(p / q) * 1e12).cast("long").as("psi_term_micro"))
  }

  /** Scalar rollup of [[psi]]: `(n_old, n_new, psi)` — exact integer
    * term sum, ONE double division. */
  def psiTotal(
      oldDf: DataFrame,
      newDf: DataFrame,
      valueCol: String,
      bins: Int = 10
  ): DataFrame =
    psi(oldDf, newDf, valueCol, bins)
      .agg(sum("n_old").as("n_old"), sum("n_new").as("n_new"),
        sum("psi_term_micro").as("__t"))
      .select(col("n_old"), col("n_new"),
        round(col("__t").cast("double") / 1e12, 6).as("psi"))
}
