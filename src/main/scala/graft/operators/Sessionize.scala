package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  */
object Sessionize {

  def sessions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gapSeconds: Long = 1800
  ): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    events
      .withColumn("__boundary",
        when(prev.isNull || (us - prev) > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__boundary")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__boundary")
  }

  /** Per-session rollup: event count, value sum, first/last timestamps. */
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
        unix_micros(min(col(tsCol))).as("start_us"),
        unix_micros(max(col(tsCol))).as("end_us")
      )
}
