package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Curated-corpus writer: the output side of the pipeline, shaped for the
  * two failure modes that actually hurt at 100 TB:
  *
  *  - **unpruned downstream reads**: directory partitioning
  *    (`partitionBy` on e.g. lang / date / pack_id) turns downstream
  *    predicate scans into partition-pruned reads (`PartitionFilters` in
  *    the scan, whole directories skipped) — asserted in CorpusSinkSpec;
  *  - **the small-files problem**: without care, every task writes a file
  *    into every partition directory (tasks x partitions files). The
  *    writer repartitions by the partition columns first so each
  *    directory is written by as few tasks as possible, and
  *    `maxRecordsPerFile` re-splits oversized partitions so single files
  *    stay bounded (the skewed-partition guard).
  *
  * Plain parquet files, no catalog dependency — unlike
  * [[IndexStore.writeBucketed]], whose bucketing metadata must live in a
  * catalog. Use IndexStore for join-key co-location; use this for
  * predicate-pruned corpus layouts.
  */
object CorpusSink {

  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 1000000L
  ): Unit = {
    require(maxRecordsPerFile > 0, s"maxRecordsPerFile must be > 0, got $maxRecordsPerFile")
    val clustered =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*) else df
    clustered.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
