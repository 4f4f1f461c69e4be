package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev probe: stage timing of the jaccard inverted-index pipeline. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val sets = docs.select(col("doc_id").as("id"), Dedup.shingleSet(col("text"), 3).as("sh"))
    t("shingle sets only")(sets.write.format("noop").mode("overwrite").save())
    val sized = sets.withColumn("set_size", size(col("sh")))
    val inv = sized.select(col("id"), col("set_size"), explode(col("sh")).as("shingle"))
    t("inverted index (explode)")(inv.write.format("noop").mode("overwrite").save())
    val mat = t("checkpoint inv")(inv.localCheckpoint(true))
    val a = mat.select(col("shingle"), col("id").as("id_a"), col("set_size").as("size_a"))
    val b = mat.select(col("shingle"), col("id").as("id_b"), col("set_size").as("size_b"))
    t("join+agg from materialized inv") {
      a.join(b, Seq("shingle")).where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b").agg(count(lit(1)).as("n_common"))
        .write.format("noop").mode("overwrite").save()
    }
    t("full jaccardPairs as shipped") {
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
