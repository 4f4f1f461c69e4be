package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Dev probe: per-expression timing of the text_stats / jaccard hot path. */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").localCheckpoint(true)
    val t = col("text")
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[tp] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("baseline select")(docs.select(col("doc_id"), length(t)))
    time("wsTokenCount")(docs.select(TextFunctions.wsTokenCount(t)))
    time("bpeishTokenCount")(docs.select(TextFunctions.bpeishTokenCount(t)))
    time("punctRatio")(docs.select(TextFunctions.punctRatio(t)))
    time("stopwordRatio")(docs.select(TextFunctions.stopwordRatio(t)))
    time("meanWordLength")(docs.select(TextFunctions.meanWordLength(t)))
    time("qualityScore")(docs.select(TextFunctions.qualityScore(t)))
    time("fingerprint")(docs.select(TextFunctions.fingerprint(t)))
    time("langId")(docs.select(TextFunctions.langId(t)))
    time("ALL text_stats cols")(docs.select(
      TextFunctions.wsTokenCount(t), TextFunctions.bpeishTokenCount(t),
      TextFunctions.punctRatio(t), TextFunctions.stopwordRatio(t),
      TextFunctions.meanWordLength(t), TextFunctions.qualityScore(t),
      TextFunctions.fingerprint(t)))
    // the exact catalog queries, as the bench runs them (fresh plan, cold)
    time("catalog text_stats run1")(graft.QueryCatalog.queries("text_stats")(spark, sfDir))
    time("catalog text_stats run2")(graft.QueryCatalog.queries("text_stats")(spark, sfDir))
    time("shingleSet n=3")(docs.select(Dedup.shingleSet(t, 3)))
    time("explode shingles")(docs.select(col("doc_id"), explode(Dedup.shingleSet(t, 3))))
    time("jaccardPairs full")(
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8))
    spark.stop()
  }
}
