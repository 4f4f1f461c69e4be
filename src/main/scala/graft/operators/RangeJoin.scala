package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair every left point row with the
  * right interval rows that contain it (`start <= ts <= end`) within the
  * same key — event-to-session attribution, trade-to-auction-window, IP
  * to CIDR block.
  *
  * Spark plans the naive
  * `l JOIN r ON l.key = r.key AND l.ts BETWEEN r.start AND r.end` as an
  * equi-join on key followed by a per-key filter, which is O(|l| x |r|)
  * work per key — a hot key degenerates to a per-key cartesian. The
  * bin-bucketed form is the standard fix: time is cut into fixed-width
  * bins, each point lands in exactly ONE bin, each interval is exploded
  * into every bin it overlaps, and the join becomes a plain equi-join on
  * (key, bin) followed by the exact containment filter. Work is
  * O(|l| + |r| x bins-per-interval + true matches); no dedup stage is
  * needed because a (point, interval) pair can only meet in the point's
  * single bin.
  *
  * `binWidth` tunes the trade: wide bins approach the per-key
  * degeneration, narrow bins multiply interval copies. Size it near the
  * typical interval length so intervals explode into O(1) copies.
  * `maxBinsPerInterval` bounds the explosion of pathological intervals
  * (a corrupt end timestamp would otherwise materialize millions of
  * copies) — exceeding it fails loudly rather than silently flooding.
  */
object RangeJoin {

  /** @param left  (keyCol, tsCol, ...) point rows
    * @param right (keyCol, startCol, endCol, ...) interval rows; output
    *              carries all left columns plus `rightCols`
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      startCol: String,
      endCol: String,
      rightCols: Seq[String],
      binWidth: Long,
      maxBinsPerInterval: Int = 4096
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    val lBinned = left.withColumn("__bin", floor(col(tsCol) / lit(binWidth)).cast("long"))
    val startBin = floor(col(startCol) / lit(binWidth)).cast("long")
    val endBin = floor(col(endCol) / lit(binWidth)).cast("long")
    val guardedEnd = when(endBin - startBin < lit(maxBinsPerInterval.toLong), endBin)
      .otherwise(raise_error(concat(
        lit(s"rangeJoin: interval spans more than $maxBinsPerInterval bins of $binWidth ("),
        col(startCol).cast("string"), lit(" .. "), col(endCol).cast("string"),
        lit(") — widen binWidth or cap the interval"))).cast("long"))
    val rBinned = right
      .where(col(keyCol).isNotNull && col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .select((right.columns.map(col) :+
        explode(sequence(startBin, guardedEnd)).as("__bin")): _*)
      .select((Seq(col(keyCol).as("__rkey"), col("__bin"),
        col(startCol).as("__start"), col(endCol).as("__end")) ++
        rightCols.map(c => col(c).as(s"r_$c"))): _*)
    lBinned
      .join(rBinned,
        lBinned(keyCol) === rBinned("__rkey") && lBinned("__bin") === rBinned("__bin"))
      .where(col(tsCol) >= col("__start") && col(tsCol) <= col("__end"))
      .drop("__bin", "__rkey", "__start", "__end")
  }

  /** Interval-OVERLAP join: pair every left interval with the right
    * intervals it overlaps (`lStart <= rEnd && rStart <= lEnd`,
    * inclusive) within the same key — session-to-outage attribution,
    * concurrent-booking detection, ad-flight overlap.
    *
    * Same bin-bucketing as [[rangeJoin]], with one twist: BOTH sides
    * explode into their overlapped bins, so a true pair would meet once
    * per SHARED bin. Instead of a distinct stage over the matches (a
    * second shuffle carrying the payload), each pair is emitted only in
    * its FIRST shared bin — `bin == max(firstBin(l), firstBin(r))`, a
    * map-side filter on join output. Work stays
    * O((|l| + |r|) x bins-per-interval + true matches) with one
    * (key, bin) equi-join and no dedup exchange. The same
    * `maxBinsPerInterval` guard bounds pathological intervals on both
    * sides. */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftStartCol: String,
      leftEndCol: String,
      rightStartCol: String,
      rightEndCol: String,
      rightCols: Seq[String],
      binWidth: Long,
      maxBinsPerInterval: Int = 4096
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    def binned(df: DataFrame, startCol: String, endCol: String): DataFrame = {
      val startBin = floor(col(startCol) / lit(binWidth)).cast("long")
      val endBin = floor(col(endCol) / lit(binWidth)).cast("long")
      val guardedEnd = when(endBin - startBin < lit(maxBinsPerInterval.toLong), endBin)
        .otherwise(raise_error(concat(
          lit(s"overlapJoin: interval spans more than $maxBinsPerInterval bins of $binWidth ("),
          col(startCol).cast("string"), lit(" .. "), col(endCol).cast("string"),
          lit(") — widen binWidth or cap the interval"))).cast("long"))
      df.where(col(keyCol).isNotNull && col(startCol).isNotNull &&
          col(endCol).isNotNull && col(startCol) <= col(endCol))
        .withColumn("__firstBin", startBin)
        .select((df.columns.map(col) :+ col("__firstBin") :+
          explode(sequence(col("__firstBin"), guardedEnd)).as("__bin")): _*)
    }
    val lBinned = binned(left, leftStartCol, leftEndCol)
      .withColumnRenamed("__firstBin", "__lFirst")
    val rBinned = binned(right, rightStartCol, rightEndCol)
      .select((Seq(col(keyCol).as("__rkey"), col("__bin").as("__rbin"),
        col("__firstBin").as("__rFirst"),
        col(rightStartCol).as("__rstart"), col(rightEndCol).as("__rend")) ++
        rightCols.map(c => col(c).as(s"r_$c"))): _*)
    lBinned
      .join(rBinned,
        lBinned(keyCol) === rBinned("__rkey") && lBinned("__bin") === rBinned("__rbin"))
      .where(col(leftStartCol) <= col("__rend") && col("__rstart") <= col(leftEndCol) &&
        col("__bin") === greatest(col("__lFirst"), col("__rFirst")))
      .drop("__bin", "__rbin", "__rkey", "__lFirst", "__rFirst", "__rstart", "__rend")
  }
}
