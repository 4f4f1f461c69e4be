package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: attach to every left row the most recent right
  * row with `right.ts <= left.ts` within the same key — the classic
  * event-stream enrichment (trade -> latest quote, click -> latest view)
  * that Spark has no native operator for.
  *
  * Shape: tag and UNION the two sides, then one key-partitioned window
  * carries the last non-null right payload forward in (ts, side) order —
  * right rows sort before left rows at equal ts, giving the inclusive
  * `<=` semantics. ONE shuffle on the key, a running window frame (no
  * re-scan per row), and no range self-join: the naive
  * `l JOIN r ON l.key = r.key AND r.ts <= l.ts` explodes to
  * O(|l| x |r|) per key before its argmax — this stays O(|l| + |r|)
  * rows end to end. At 100 TB the partition is one key's history; for
  * heavy keys, pre-bucket by (key, time range) and as-of within buckets
  * after seeding each bucket with its predecessor's last row.
  *
  * Contract: right rows must be unique per (key, ts) — pre-aggregate
  * ties (the catalog query keys by max) — and right rows with a NULL key
  * or NULL ts are dropped (they can never match; keeping them would make
  * the null-key window partition match null-key left rows, which
  * SQL-equality join semantics never do). Left rows with no prior right
  * row keep NULL payloads (left-join semantics).
  */
object AsOfJoin {

  /** @param payloadCols right-side columns carried onto left rows (output
    *                    as `asof_<name>`); must exist on `right`
    * @param leftCols    left-side columns passed through unchanged */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String],
      leftCols: Seq[String] = Nil
  ): DataFrame = {
    require(payloadCols.nonEmpty, "asOf: at least one payload column")
    val lTag = left.select(
      Seq(col(keyCol), col(tsCol).as("__ts"), lit(1).as("__side")) ++
        leftCols.map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val rTag = right
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(
        Seq(col(keyCol), col(tsCol).as("__ts"), lit(0).as("__side")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    // ONE carry-forward over a struct of the whole right payload, not one
    // last() per column: per-column ignoreNulls would skip right rows
    // whose payload value is GENUINELY null and could stitch together
    // fields from different right rows — the struct is non-null for every
    // right row (even all-null payloads), so ignoreNulls skips exactly
    // the left-row placeholders, matching ASOF semantics. One window
    // expression, one Window node.
    val payloadStruct = when(col("__side") === 0,
      struct(payloadCols.map(c => col(s"__p_$c").as(c)): _*))
    val w = Window.partitionBy(keyCol).orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTag.unionByName(rTag)
      .withColumn("__asof", last(payloadStruct, ignoreNulls = true).over(w))
    carried.where(col("__side") === 1)
      .select(Seq(col(keyCol), col("__ts").as(tsCol)) ++ leftCols.map(col) ++
        payloadCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
