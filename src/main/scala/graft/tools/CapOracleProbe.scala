// Dev probe (r13): cross-engine check of the CAPPED jaccard oracle on a
// corpus where the cap BINDS. The sf0.01 gate can't see a broken capped
// CTE (no shingle reaches 1000 there), so this plants a hot trigram in
// half the sf0.001 docs, runs Spark's jaccardPairs with maxDf=10, and
// dumps corpus + pairs for tools/cap_oracle_check.py to replay the
// capped SQL in DuckDB and diff.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

object CapOracleProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/cap_oracle")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" hotk0 hotk1 hotk2"))).otherwise(col("text")).as("text"))
    docs.write.mode("overwrite").parquet(s"$out/docs.parquet")
    Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5, maxDf = Some(10L))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
      .write.mode("overwrite").parquet(s"$out/pairs.parquet")
    println(s"[cap-probe] wrote $out/docs.parquet and $out/pairs.parquet")
    spark.stop()
  }
}
