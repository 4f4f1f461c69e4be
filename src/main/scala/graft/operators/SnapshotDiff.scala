package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the change-audit primitive between two
  * versions of a document table (yesterday's crawl vs today's, the
  * pre-curation corpus vs a vendor re-delivery). Classifies every id
  * as `added` / `removed` / `changed` / `unchanged` by CONTENT hash,
  * and resolves `moved` ids: an added id whose content identically
  * exists among the removed ids (a re-keying, not new data — the case
  * that silently poisons dedup-by-id incremental pipelines).
  *
  * Hash: `md5(text)` — content-defined, engine-portable (the exact
  * oracle computes the same hex in DuckDB), and collision-safe at
  * corpus scale for AUDIT purposes (this op flags equality, it does
  * not silently drop — the dedup family owns destructive decisions).
  *
  * Scale shape: one full-outer equi-join keyed by id (both snapshots
  * shuffle once on the key they are naturally bucketed by in a
  * versioned lake — with bucketed snapshots the exchange vanishes
  * entirely), then one equi-join keyed by hash between the two
  * SMALL change slices (added x removed) to resolve moves — never
  * against the full corpus. Nothing driver-side; output is one row
  * per id in either snapshot.
  */
object SnapshotDiff {

  /** `(id, status, old_hash, new_hash, moved_from)` for every id in
    * either snapshot. `status` ∈ added | removed | changed | unchanged;
    * `moved_from` is the SMALLEST removed id carrying identical content
    * (deterministic witness), null elsewhere — including for `removed`
    * rows and for added content that duplicates a SURVIVING doc (that
    * is the dedup family's finding, not a move).
    *
    * Ids keep their NATIVE type (string doc ids join as strings — a
    * lossy cast would turn them into NULL join keys and misclassify
    * every such doc as simultaneously added and removed); NULL ids are
    * rejected up front because a NULL key never matches itself in the
    * full-outer join, which would silently duplicate the row into both
    * change slices. */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    def hashed(d: DataFrame, h: String) = d.select(
      when(col(idCol).isNull,
        raise_error(lit(s"SnapshotDiff.diff: NULL $idCol"))
      ).otherwise(col(idCol)).as("id"),
      md5(coalesce(col(textCol), lit(""))).as(h))
    val o = hashed(oldSnap, "old_hash")
    val n = hashed(newSnap, "new_hash")
    val joined = o.join(n, Seq("id"), "full_outer")
      .select(col("id"), col("old_hash"), col("new_hash"),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
    // move resolution: added content found verbatim in the removed slice
    val removedWitness = joined.where(col("status") === "removed")
      .groupBy(col("old_hash").as("new_hash"))
      .agg(min("id").as("moved_from"))
    joined.join(removedWitness,
        joined("status") === "added" &&
          joined("new_hash") === removedWitness("new_hash"),
        "left")
      .select(joined("id"), col("status"), col("old_hash"),
        joined("new_hash"), col("moved_from"))
  }

  /** One-row rollup `(n_added, n_removed, n_changed, n_unchanged,
    * n_moved)` — the gate a scheduled re-crawl publishes. */
  def summary(diffed: DataFrame): DataFrame =
    diffed.agg(
      sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
      sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
      sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
      sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
      sum(when(col("moved_from").isNotNull, 1L).otherwise(0L)).as("n_moved"))
}
