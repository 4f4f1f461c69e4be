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
  * Timestamp handling: the provided `events.parquet` stores `ts` as
  * parquet TIMESTAMP(NANOS), which Spark 4 cannot read as a timestamp —
  * the scan throws PARQUET_TYPE_ILLEGAL unless
  * `spark.sql.legacy.parquet.nanosAsLong=true`, in which case the column
  * arrives as LongType *nanoseconds*. [[epochMicros]] branches on the
  * column's runtime type: long nanos are floor-divided to micros (matching
  * DuckDB's ns->us truncation), real timestamps go through `unix_micros`.
  */
object Sessionize {

  /** Epoch-microseconds column for `tsCol`, whatever physical type the
    * scan produced (long nanos under nanosAsLong, or a real timestamp). */
  def epochMicros(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case LongType                          => expr(s"`$tsCol` div 1000L")
      case TimestampType | TimestampNTZType  => unix_micros(col(tsCol))
      case other =>
        throw new IllegalArgumentException(
          s"sessionize: unsupported timestamp column type $other for `$tsCol`")
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
