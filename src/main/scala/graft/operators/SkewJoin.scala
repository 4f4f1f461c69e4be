package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the classic remedy when ONE join key
  * holds a disproportionate share of the fact rows, the dimension side is
  * too big to broadcast, and AQE's skew-join split (which handles most
  * cases; see PLANS.md) can't apply — e.g. when the skewed stage is
  * pinned by a required distribution, or under a streaming micro-batch
  * where AQE is off.
  *
  * Shape: the fact side gets a deterministic salt in `[0, numSalts)`; the
  * dimension side is exploded into `numSalts` copies, one per salt value;
  * the join runs on `keys :+ salt`. Every fact row still matches exactly
  * the dimension rows it matched before (its salt picks exactly one of
  * the copies), so the result is row-identical to the unsalted join —
  * asserted against a plain-join oracle — while the hottest key's rows
  * spread across `numSalts` reducer tasks instead of one straggler.
  *
  * The salt must be DETERMINISTIC (retry/partitioning-independent), so it
  * is a content hash (`xxhash64`) of the fact row rather than `rand()` or
  * `spark_partition_id()` — a Spark task retry re-computes the same salt
  * and the shuffle stays consistent. Identical duplicate fact rows share
  * a salt; that is the only residual co-location and it is bounded by the
  * true duplicate count, not by key heat.
  *
  * Cost: `numSalts - 1` extra copies of the dimension rows through the
  * dim-side shuffle. Size `numSalts` to the skew ratio (hottest-key rows
  * / target-per-task rows), not higher.
  *
  * Note on AGGREGATION skew: no salting needed there — hash aggregation
  * is map-side combined (partial rows per (task, key), see PLANS.md), so
  * a hot GROUP BY key reduces before the exchange. Salting is for JOINs,
  * where matching rows must meet.
  */
object SkewJoin {

  /** Inner equi-join of `fact` with `dim` on `keys`, salted `numSalts`
    * ways. Output columns = the unsalted join's (join keys merged). */
  def saltedInnerJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      numSalts: Int
  ): DataFrame = {
    require(keys.nonEmpty, "at least one join key")
    require(numSalts >= 2, s"numSalts must be >= 2, got $numSalts")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(numSalts)))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit((numSalts - 1).toLong))))
    salted
      .join(exploded, keys :+ "__salt")
      .drop("__salt")
  }
}
