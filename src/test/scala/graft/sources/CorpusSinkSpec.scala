package graft.sources

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

class CorpusSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val outDir =
    s"${System.getProperty("java.io.tmpdir")}/graft-test-corpus-sink"

  private lazy val written = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("lang", TextFunctions.langId(col("text")))
    CorpusSink.writePartitioned(docs, outDir, Seq("lang"))
    docs.count()
  }

  test("partitioned write round-trips all rows with the partition column intact") {
    val n = written
    val back = spark.read.parquet(outDir)
    assert(back.count() == n)
    assert(back.columns.contains("lang"))
  }

  test("downstream predicate on the partition column prunes at planning time") {
    val n = written
    assert(n > 0)
    val plan = spark.read.parquet(outDir).where(col("lang") === "en")
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter must prune directories:\n$plan")
    // the data filter must NOT also appear as a row-level PushedFilter —
    // pruning happens before the scan, not inside it
    assert(!plan.contains("PushedFilters: [IsNotNull(lang"), plan)
  }

  test("clustered write keeps files-per-partition-directory bounded") {
    val n = written
    assert(n > 0)
    val dirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty, "expected lang=* partition directories")
    dirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1,
        s"${d.getName}: $files files — repartition-by-partition-col must prevent task fanout")
    }
  }

  test("tasksPerPartition salts hot partitions across tasks, still bounded") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("lang", TextFunctions.langId(col("text")))
    val skewDir = s"$outDir-salted"
    // at test scale AQE would re-coalesce the salted shuffle into one
    // task (everything is "small"); at real scale it only merges small
    // partitions and the hot ones keep their salt spread — pin it off so
    // the test observes the production behavior
    val coalesceConf = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceConf)
    try {
      spark.conf.set(coalesceConf, "false")
      CorpusSink.writePartitioned(docs, skewDir, Seq("lang"), tasksPerPartition = 3)
    } finally spark.conf.set(coalesceConf, prev)
    val back = spark.read.parquet(skewDir)
    assert(back.count() == docs.count())
    val dirs = new java.io.File(skewDir).listFiles().filter(_.isDirectory)
    val fileCounts = dirs.map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(fileCounts.forall(_ <= 3), s"per-dir files must stay <= tasksPerPartition: ${fileCounts.toSeq}")
    // the hot partition actually spreads across more than one writer task
    assert(fileCounts.max > 1, s"expected the salt to split the hottest partition: ${fileCounts.toSeq}")
  }
}
