package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Event sessionization: assign a per-user session index that increments
  * whenever the gap to the previous event exceeds `gapSeconds`, then
  * aggregate per session.
  *
  * One shuffle, keyed by user (the window partition); the session index is
  * a running sum of boundary flags — integer arithmetic on epoch
  * microseconds throughout, so results are exactly reproducible across
  * engines. Skewed users (one user = one partition's worth of events) are
  * the classic hazard at 100 TB; mitigate upstream by bucketing the events
  * table by user_id, and AQE skew handling covers the rest.
  *
  * Timestamp handling: driver-generated `events.parquet` has shipped `ts`
  * as parquet TIMESTAMP(NANOS) (readable only under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, arriving as LongType
  * *nanoseconds*) and as `timestamp[us]` without a zone (arriving as
  * TIMESTAMP_NTZ in Spark 4). [[epochMicros]] branches on the column's
  * runtime type — long nanos floor-divide to micros (DuckDB's ns->us
  * truncation), TIMESTAMP goes through `unix_micros`, NTZ casts to
  * TIMESTAMP first (exact under the pinned-UTC session tz). Sources
  * should call [[normalizeTs]] once at load so downstream operators see
  * canonical TimestampType regardless of the file's encoding.
  */
object Sessionize {

  /** Epoch-microseconds column for `tsCol`, whatever physical type the
    * scan produced (long nanos under nanosAsLong, TIMESTAMP, or
    * TIMESTAMP_NTZ — parquet `timestamp[us]` without a zone arrives as the
    * latter in Spark 4). `unix_micros` only accepts TIMESTAMP, so the NTZ
    * arm casts first; with the session timezone pinned to UTC everywhere
    * (Bench/TestSpark builders) that cast is a pure reinterpretation and
    * matches DuckDB's `epoch_us(ts)` on the same file. */
  def epochMicros(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      // FLOOR division, not bare `div`: pre-1970 nanos with a sub-us
      // component would otherwise truncate toward zero and disagree by
      // 1 us with an engine's floor-semantics epoch_us on the same file
      // (the cohortRetention week-bucket class of bug, r13)
      case LongType =>
        expr(s"(`$tsCol` div 1000L) - " +
          s"(CASE WHEN `$tsCol` % 1000L < 0 THEN 1 ELSE 0 END)")
      case TimestampType    => unix_micros(col(tsCol))
      case TimestampNTZType =>
        // the NTZ->TIMESTAMP cast interprets the wall-clock in the SESSION
        // timezone: only UTC makes it a pure reinterpretation of the file's
        // zoneless micros. Every in-repo entry point pins UTC, but a library
        // consumer without the pin would get silently shifted instants —
        // fail loudly instead.
        require(
          df.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
          s"sessionize: `$tsCol` is TIMESTAMP_NTZ and interpreting it as an " +
            "instant requires spark.sql.session.timeZone=UTC (set it on the " +
            "session builder, or normalize the column upstream)")
        unix_micros(col(tsCol).cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(
          s"sessionize: unsupported timestamp column type $other for `$tsCol`")
    }

  /** Canonical event-time frame: `tsCol` coerced to TimestampType
    * (micros precision), whatever physical encoding the scan produced.
    * Load-time choke point — pipe every event source through this once
    * and no downstream operator (batch sessionize/as-of/range join, or
    * streaming `session_window`, which REQUIRES a real timestamp) ever
    * branches on the file's encoding du jour. Nanos truncate to micros,
    * matching DuckDB's `epoch_us` on the same file. */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case TimestampType => df
      case _             => df.withColumn(tsCol, timestamp_micros(epochMicros(df, tsCol)))
    }

  /** Input events plus `event_us` (epoch micros) and `session_idx`.
    *
    * The window order carries a deterministic tie-break (`tieBreakCol`
    * when present in the frame): equal-timestamp events of one user would
    * otherwise make the evaluation order — and, under task retries, the
    * window's row stream — nondeterministic. Gap-0 ties can't change
    * `session_idx` values, but a total order is what makes the operator
    * safely re-executable at scale. */
  def sessions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gapSeconds: Long = 1800,
      tieBreakCol: String = "event_id"
  ): DataFrame = {
    val us = epochMicros(events, tsCol)
    val orderCols = col("event_us") +:
      (if (events.columns.contains(tieBreakCol)) Seq(col(tieBreakCol)) else Nil)
    val w = Window.partitionBy(userCol).orderBy(orderCols: _*)
    val prev = lag(col("event_us"), 1).over(w)
    events
      .withColumn("event_us", us)
      .withColumn("__boundary",
        when(prev.isNull || (col("event_us") - prev) > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__boundary")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__boundary")
  }

  /** Per-key exponentially-weighted moving average of `valueCol` in
    * event-time order — the recency-weighted engagement / rate signal
    * (y_1 = x_1; y_t = a*x_t + (1-a)*y_{t-1}). Output per key:
    * `(keyCol, n_events, ewma)` over the non-null values.
    *
    * The recurrence is inherently sequential, so it runs as ONE
    * key-partitioned aggregate: events collect into a (ts, tie, value)
    * struct array, `array_sort` pins event-time order (tie-broken by
    * `tieCol`, so the order is total and retry-stable), and the EWMA is
    * an in-row left fold — partitioning-independent bit-for-bit (the
    * DSIR rule), which is what lets the gate hash a float produced from
    * shuffled rows, and lets a SQL twin replay it with
    * `list_reduce(list(v ORDER BY ts, tie), ...)`.
    *
    * Scale: one shuffle keyed by `keyCol`; per-key state is that key's
    * event array (the sessionize regime — bound it upstream by
    * windowing ts). For mega-keys, EWMA composes across ordered chunks:
    * y(AB) = (1-a)^|B| * y(A) + y(B with zero init), so a chunked
    * two-pass variant exists without changing the math — not needed at
    * the catalog's per-user volumes. */
  def ewma(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      alpha: Double
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val beta = 1.0 - alpha // computed ONCE here; a SQL twin must replay 1.0 - a, not a 0.x literal
    val g = events
      .where(col(valueCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("ts"), col(tieCol).as("tie"),
        col(valueCol).cast("double").as("v")))).as("__arr"))
    g.select(
      col(keyCol),
      size(col("__arr")).cast("long").as("n_events"),
      aggregate(
        slice(col("__arr"), lit(2), greatest(size(col("__arr")) - 1, lit(0))),
        element_at(col("__arr"), 1).getField("v"),
        (acc, x) => lit(alpha) * x.getField("v") + lit(beta) * acc).as("ewma"))
  }

  /** Ordered funnel analysis: for each user, the earliest time they
    * completed each step of `steps` IN ORDER (step k's timestamp is the
    * minimum event time of that step's type strictly after step k-1's
    * completion — the standard "view -> click -> purchase" conversion
    * measure, not mere set membership). Output: one row per user who
    * reached step 1, with `t<k>_us` epoch-micros per completed step
    * (null once the funnel breaks) and `stage` = number of steps
    * completed.
    *
    * Shape: one user-keyed aggregate per step plus a user-keyed equi
    * join per later step — all shuffles on the user key, candidate rows
    * filtered to the step's type BEFORE the join (each stage's input is
    * that type's events, not the whole log). The conditional-min is
    * null-strict: a broken funnel propagates nulls through the
    * remaining stages without special-casing. */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"duplicate step types in $steps")
    val base = events.select(col(userCol).as("user_id"),
      epochMicros(events, tsCol).as("__us"), col(typeCol).as("__t"))
    val first = base.where(col("__t") === steps.head)
      .groupBy("user_id").agg(min("__us").as("t1_us"))
    val full = steps.tail.zipWithIndex.foldLeft(first) { case (acc, (st, i)) =>
      val k = i + 2
      val prior = (1 until k).map(j => s"t${j}_us")
      val cands = base.where(col("__t") === st)
        .select(col("user_id"), col("__us").as("__c"))
      acc.join(cands, Seq("user_id"), "left")
        .groupBy("user_id", prior: _*)
        .agg(min(when(col("__c") > col(s"t${k - 1}_us"), col("__c"))).as(s"t${k}_us"))
    }
    // fold ascending so the final chain tests the DEEPEST step first
    val stage = steps.indices.foldLeft(lit(0)) { (rest, i) =>
      when(col(s"t${i + 1}_us").isNotNull, lit(i + 1)).otherwise(rest)
    }
    full.withColumn("stage", stage)
  }

  /** Volume-anomaly detection over hourly event counts: flag
    * (hour, type) buckets whose count deviates from that type's mean by
    * at least `zThreshold` standard deviations — the monitoring-side
    * "traffic spike / outage dip" primitive.
    *
    * Determinism discipline: the statistics are computed from INTEGER
    * sums only (n, Σc, Σc² — all exact longs; a naive avg/stddev over
    * doubles would depend on shuffle arrival order), and the z-score is
    * one closed-form double per row from those exact integers — so the
    * flagged set and the scores hash-replay in any engine. Long
    * arithmetic bounds the per-type total at ~3e9 events before Σc²
    * style products overflow; beyond that, lift the sums to DECIMAL.
    * Buckets with zero variance (a type with constant hourly volume)
    * are excluded — their z is undefined, not infinite.
    *
    * Shape: one (bucket, type)-keyed count (map-side combined), one
    * type-keyed stats rollup (rows = types), broadcast join back.
    * Output: `(window_start_us, event_type, n_events, z)` for flagged
    * buckets. */
  def hourlyCountAnomalies(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      zThreshold: Double = 2.0
  ): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be > 0, got $zThreshold")
    val buckets = normalizeTs(events, tsCol)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("c"))
    val stats = buckets.groupBy("event_type")
      .agg(count(lit(1)).as("__n"), sum("c").as("__s1"),
        sum(col("c") * col("c")).as("__s2"))
    val mu = col("__s1").cast("double") / col("__n")
    val sigma = sqrt((col("__n") * col("__s2") - col("__s1") * col("__s1")).cast("double") /
      (col("__n") * col("__n")))
    buckets.join(broadcast(stats), Seq("event_type"))
      .where(col("__n") * col("__s2") - col("__s1") * col("__s1") > 0)
      .withColumn("z", (col("c").cast("double") - mu) / sigma)
      .where(abs(col("z")) >= lit(zThreshold))
      .select(col("window_start_us"), col("event_type"),
        col("c").as("n_events"), col("z"))
  }

  /** Weekly cohort retention: users grouped by their FIRST-activity week
    * (the cohort), counted per subsequent active week — the standard
    * retention triangle. `week` = floor(epoch-micros / week-micros)
    * (epoch-aligned FLOOR division, so pre-1970 timestamps land in
    * negative weeks exactly as an engine's `//` does; no timezone or
    * calendar dependence, so any engine reproduces it).
    * Output: `(cohort_week, active_week, n_users)`.
    *
    * Shape: first-week table is one user-keyed aggregate; distinct
    * (user, week) activity is a second; the cohort join is user-keyed;
    * the final rollup is (cohort, week)-keyed and map-side combined.
    * Counts are exact integers — hashable in any engine. */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String
  ): DataFrame = {
    val base = events
      .select(col(userCol).as("user_id"), epochMicros(events, tsCol).as("__us"))
      .where(col("user_id").isNotNull)
      // integer FLOOR division, not double (epoch micros near 2^53 would
      // lose exactness through a true-division round trip) and not bare
      // `div` (truncation toward zero would collapse weeks -0/0 and
      // disagree with the oracle's `//` on pre-1970 timestamps)
      .select(col("user_id"),
        expr("(__us div 604800000000) - " +
          "(CASE WHEN __us % 604800000000 < 0 THEN 1 ELSE 0 END)").as("week"))
    val firstWeek = base.groupBy("user_id").agg(min("week").as("cohort_week"))
    val active = base.distinct()
    active.join(firstWeek, Seq("user_id"))
      .groupBy(col("cohort_week"), col("week").as("active_week"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-session rollup: event count, value sum, first/last timestamps
    * (epoch micros). */
  def sessionStats(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      gapSeconds: Long = 1800
  ): DataFrame =
    sessions(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 6).as("sum_value"),
        min(col("event_us")).as("start_us"),
        max(col("event_us")).as("end_us")
      )
}
