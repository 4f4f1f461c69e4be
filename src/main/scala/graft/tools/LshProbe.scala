package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev probe: stage-by-stage timing of the minhash-LSH pipeline. */
object LshProbe {
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
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", 32, 3)
    t("signatures once")(sigs.write.format("noop").mode("overwrite").save())
    val mat = t("localCheckpoint sigs")(sigs.localCheckpoint(true))
    t("full pipeline (as shipped)") {
      Dedup.minHashLshPairs(docs, "doc_id", "text", 32, 3, 8, 0.7)
        .write.format("noop").mode("overwrite").save()
    }
    // banding+join from materialized sigs
    val rowsPerBand = 4
    val banded = mat.select(col("id"), col("signature"),
      posexplode(array((0 until 8).map { b =>
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r => col("signature")(b * rowsPerBand + r)): _*), lit(b))
      }: _*)).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("signature").as("sig_a"))
    val b2 = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("signature").as("sig_b"))
    val cand = a.join(b2, Seq("band", "bucket")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").dropDuplicates("id_a", "id_b")
    val nCand = t("banding+join from materialized sigs")(cand.count())
    println(s"[probe] candidates=$nCand")
    spark.stop()
  }
}
