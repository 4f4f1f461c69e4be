package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persisted, bucket-pruned index storage — the executable form of the
  * "at 100 TB, write the index once bucketed by its probe key" story the
  * ANN/dedup operators document ([[graft.operators.Similarity.lshIndex]],
  * [[graft.operators.Similarity.ivfIndex]], minhash signatures).
  *
  * Why bucketing, concretely:
  *   - a probe-side equi-join on the bucket key (batch ANN's candidate
  *     join) needs NO shuffle on the index side — the scan's output
  *     partitioning already matches the join requirement, so only the
  *     (small) query side moves. Rewriting a 100 TB index's shuffle into
  *     a one-time write cost is the whole point;
  *   - a single-bucket lookup (`WHERE bucket = x`) prunes to 1/numBuckets
  *     of the files at planning time (`SelectedBucketsCount` in the scan
  *     node) — the single-query ANN probe reads only its ball's buckets.
  *
  * Both properties are asserted in CI (IndexStoreSpec / PlanAuditSpec),
  * not just claimed: the candidate join plan must show exactly one
  * exchange (probe side), and the point lookup must show bucket pruning.
  *
  * `saveAsTable` is required because bucketing metadata lives in the
  * session catalog, not the parquet footer — `parquet(path)` round-trips
  * the DATA but forgets the bucketing. On a real cluster the catalog is
  * shared (metastore); in local sessions the table must be (re)registered
  * by the writing session.
  */
object IndexStore {

  /** Write `index` bucketed by `bucketCol` into `numBuckets` buckets,
    * sorted within each bucket (by `sortCols`, defaulting to the bucket
    * key) so bucket-local scans are ordered. Choose `numBuckets` so one
    * bucket's rows fit an executor's working memory at the target scale —
    * for a 2^nBits-signature LSH index a power of two <= 2^nBits keeps
    * whole signatures co-located. */
  def writeBucketed(
      index: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit = {
    dropWithLocation(index.sparkSession, table)
    bucketedSave(index, table, bucketCol, numBuckets, sortCols, SaveMode.Overwrite)
  }

  /** The one writer both the fresh write and the append go through, so
    * their bucket/sort spec can never silently diverge. */
  private def bucketedSave(
      index: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String],
      mode: SaveMode
  ): Unit = {
    val w = index.write.mode(mode).format("parquet").bucketBy(numBuckets, bucketCol)
    val sorted = sortCols match {
      case head +: tail => w.sortBy(head, tail: _*)
      case _            => w.sortBy(bucketCol)
    }
    sorted.saveAsTable(table)
  }

  /** Append `index` rows into an EXISTING bucketed table with the same
    * bucket spec — the incremental-ingest half of the index story: a new
    * batch lands as additional per-bucket files (Spark buckets the
    * appended rows with the table's own spec and refuses a mismatched
    * one), and the probe-side scan still reports the bucketing, so the
    * probe join stays exchange-free on the index side after any number
    * of appends (IndexStoreSpec asserts both properties). */
  def appendBucketed(
      index: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit =
    bucketedSave(index, table, bucketCol, numBuckets, sortCols, SaveMode.Append)

  /** Plain (unbucketed) managed-table write with the same overwrite
    * semantics — for small sidecar tables that travel WITH a bucketed
    * index but are broadcast at probe time rather than joined on the
    * bucket key (e.g. an IVF index's quantizer centroids: nlist x dim
    * doubles, trivially small next to the corpus-sized index). */
  def writeTable(df: DataFrame, table: String): Unit = {
    dropWithLocation(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  /** Overwrite semantics must also cover the orphan-location case: with a
    * local in-memory catalog the table ENTRY dies with the session but its
    * managed LOCATION survives on disk, and Spark refuses to recreate a
    * managed table over an existing location. Dropping both makes
    * overwrite mean overwrite. The catalog lowercases table identifiers,
    * so the managed location is warehouse/<lowercased name> — cleaning the
    * raw-cased path would miss the real orphan. */
  private def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/${table.toLowerCase(java.util.Locale.ROOT)}")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** The bucketed index as a DataFrame; its scan reports the bucketing as
    * output partitioning, which is what downstream equi-joins exploit. */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
