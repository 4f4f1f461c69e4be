package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * heavy keys use [[asOfBucketed]], which pre-buckets by (key, time
  * range) and as-ofs within buckets after seeding each bucket with its
  * predecessor's last row.
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

  /** Heavy-key (skew-safe) as-of: identical semantics to [[asOf]], but no
    * window partition ever holds one key's full history. Each key's
    * timeline is split into `bucketWidth`-sized ranges and the carry-
    * forward runs per (key, bucket) — a hot key with a billion events
    * becomes span/bucketWidth bounded tasks instead of one straggler.
    *
    * Cross-bucket history is restored by SEEDING: per (key, bucket) the
    * last right payload is reduced (one aggregate over the right side),
    * a bucket-spine window — O(#buckets) rows per key, not O(rows) —
    * carries it to each STRICTLY LATER bucket's start, and the seed row
    * sorts before everything in its bucket (side -1 at the bucket's
    * first tick). A left row then sees exactly: seeds (history before
    * its bucket) then in-bucket right rows up to its ts.
    *
    * Requires an integral `tsCol` (epoch micros in the catalog); the
    * bucket id is the bucket's START timestamp, computed entirely in
    * long arithmetic (`ts - pmod(ts, width)`) — exact for negative
    * timestamps AND for magnitudes beyond 2^53, where a division-based
    * index would round in double. Same contract as [[asOf]]. Result
    * identity with [[asOf]] (including a single key holding every row)
    * is asserted by AsOfJoinSpec. */
  def asOfBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String],
      leftCols: Seq[String] = Nil,
      bucketWidth: Long = 86400L * 1000000 // one day of micros
  ): DataFrame = {
    require(payloadCols.nonEmpty, "asOfBucketed: at least one payload column")
    require(bucketWidth > 0, s"asOfBucketed: bucketWidth must be positive, got $bucketWidth")
    // The bucket id IS the bucket's start timestamp: `ts - pmod(ts, w)`
    // stays in exact long arithmetic (pmod is the non-negative remainder,
    // so pre-epoch timestamps land in their floor bucket). No division:
    // Spark's `/` promotes longs to double, which silently rounds bucket
    // indices for timestamps beyond 2^53 — epoch NANOseconds (~1.7e18)
    // would mis-bucket and desynchronize the seeds from their rows.
    def bucketOf(ts: Column): Column = (ts - pmod(ts, lit(bucketWidth))).cast("long")

    val rClean = right.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val rPayload = struct(payloadCols.map(c => col(c).as(c)): _*)
    // last right payload per (key, bucket): one map-side-combining
    // aggregate over the right side (right rows are unique per (key, ts)
    // by the asOf contract, so max_by is deterministic)
    val bucketLast = rClean
      .groupBy(col(keyCol), bucketOf(col(tsCol)).as("__bucket"))
      .agg(max_by(rPayload, col(tsCol)).as("__last"))
    // bucket spine: every (key, bucket) either side touches. Row count is
    // bounded by distinct time ranges, not events — this is what makes
    // the per-key window below safe for hot keys.
    val spine = left
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), bucketOf(col(tsCol)).as("__bucket"))
      .distinct()
      .unionByName(bucketLast.select(col(keyCol), col("__bucket")))
      .distinct()
    val wSpine = Window.partitionBy(keyCol).orderBy(col("__bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = spine
      .join(bucketLast, Seq(keyCol, "__bucket"), "left")
      .withColumn("__seed", last(col("__last"), ignoreNulls = true).over(wSpine))
      .where(col("__seed").isNotNull)
      .select(
        Seq(col(keyCol), col("__bucket").as("__ts"), // bucket id = bucket start
          col("__bucket"), lit(-1).as("__side")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(c => col("__seed").getField(c).as(s"__p_$c")): _*)

    val lTag = left.select(
      Seq(col(keyCol), col(tsCol).as("__ts"), bucketOf(col(tsCol)).as("__bucket"),
        lit(1).as("__side")) ++
        leftCols.map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val rTag = rClean.select(
      Seq(col(keyCol), col(tsCol).as("__ts"), bucketOf(col(tsCol)).as("__bucket"),
        lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    // the seed's (__ts = bucket start, __side = -1) sorts before any real
    // row of its bucket; from there the carry-forward is asOf verbatim,
    // just partitioned by (key, bucket)
    val payloadStruct = when(col("__side") <= 0,
      struct(payloadCols.map(c => col(s"__p_$c").as(c)): _*))
    val w = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTag.unionByName(rTag).unionByName(seeds)
      .withColumn("__asof", last(payloadStruct, ignoreNulls = true).over(w))
    carried.where(col("__side") === 1)
      .select(Seq(col(keyCol), col("__ts").as(tsCol)) ++ leftCols.map(col) ++
        payloadCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
