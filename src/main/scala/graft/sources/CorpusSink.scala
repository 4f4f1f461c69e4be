package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Curated-corpus writer: the output side of the pipeline, shaped for the
  * two failure modes that actually hurt at 100 TB:
  *
  *  - **unpruned downstream reads**: directory partitioning
  *    (`partitionBy` on e.g. lang / date / pack_id) turns downstream
  *    predicate scans into partition-pruned reads (`PartitionFilters` in
  *    the scan, whole directories skipped) — asserted in CorpusSinkSpec;
  *  - **the small-files problem**: without care, every task writes a file
  *    into every partition directory (tasks x partitions files). The
  *    writer clusters rows by (partition columns, salt) so each directory
  *    is written by at most `tasksPerPartition` tasks, and
  *    `maxRecordsPerFile` re-splits oversized outputs so single files
  *    stay bounded.
  *
  * The salt matters: repartitioning by the partition columns ALONE would
  * funnel every row of a hot partition value (e.g. lang='en' ~ 90% of a
  * web corpus) through ONE shuffle reducer — a straggler/OOM task that
  * maxRecordsPerFile cannot help, since it only splits that task's
  * OUTPUT. `tasksPerPartition` bounds per-task rows at
  * |hottest partition| / tasksPerPartition while keeping
  * files-per-directory bounded by the same knob: size it as
  * ceil(|hottest partition's bytes| / target file bytes).
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
      maxRecordsPerFile: Long = 1000000L,
      tasksPerPartition: Int = 1
  ): Unit = {
    require(maxRecordsPerFile > 0, s"maxRecordsPerFile must be > 0, got $maxRecordsPerFile")
    require(tasksPerPartition >= 1, s"tasksPerPartition must be >= 1, got $tasksPerPartition")
    val clustered =
      if (partitionCols.isEmpty) df
      else if (tasksPerPartition == 1)
        // no salt needed: one writer task per partition value
        df.repartition(partitionCols.map(col): _*)
      else {
        // deterministic row-content salt, stable across retries (rand()
        // would break speculative re-execution). Spark's hash() rejects
        // MapType, so only map-free columns feed it — partition columns
        // alone would be constant within a directory and spread nothing.
        def mapFree(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
          case _: org.apache.spark.sql.types.MapType => false
          case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => mapFree(f.dataType))
          case a: org.apache.spark.sql.types.ArrayType => mapFree(a.elementType)
          case _ => true
        }
        val hashable = df.schema.fields.collect { case f if mapFree(f.dataType) => f.name }
        require(hashable.exists(!partitionCols.contains(_)),
          "writePartitioned: no map-free non-partition column to salt by; " +
            "pass tasksPerPartition = 1 or add a hashable column")
        val salt = pmod(hash(hashable.map(col).toIndexedSeq: _*), lit(tasksPerPartition))
        df.repartition(partitionCols.map(col) :+ salt: _*)
      }
    clustered.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
