package graft.examples

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}

/** End-to-end training-data curation pipeline over the provided tables —
  * the composition story: quality-score and language-filter documents,
  * drop near-duplicates (jaccard pairs -> greedy materialization), attach
  * embedding near-dup pruning, and extract multimodal features for what
  * survives. Prints stage counts; `sbt "runMain graft.examples.PipelineDemo"`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.make()
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = docs.count()

    // 1. text analysis: language ID + quality scoring as filterable columns
    val scored = docs
      .withColumn("lang_detected", TextFunctions.langId(col("text")))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("n_tokens", TextFunctions.wsTokenCount(col("text")))
    val kept = scored.where(col("quality") >= 0.5 && col("n_tokens") >= 10)
    val n1 = kept.count()

    // 2. near-duplicate removal: trigram jaccard pairs -> greedy drop
    val pairs = Dedup.jaccardPairs(kept, "doc_id", "text", n = 3, threshold = 0.8)
    val deduped = Dedup.dropDuplicatePairs(kept, "doc_id", pairs)
    val n2 = deduped.count()

    // 3. embedding-space pruning on the aligned embeddings table
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embPairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.95, nBits = 16, bands = 4, dim = Some(64))
    val embKept = Dedup.dropDuplicatePairs(emb, "vec_id", embPairs)
    val n3 = embKept.count()

    // 4. multimodal feature extraction for the surviving docs
    val media = Multimodal.asMedia(
      deduped.withColumn("bytes", col("text").cast("binary")),
      "doc_id", "bytes", "image", "png")
    val features = Multimodal.extractFeatures(media, dim = 32)
    val n4 = features.where(col("features").isNotNull).count()

    println(s"[pipeline] docs=$n0 -> quality/lang kept=$n1 -> deduped=$n2; " +
      s"embeddings kept=$n3; media features=$n4")
    require(n1 <= n0 && n2 <= n1 && n4 == n2, "pipeline stage counts inconsistent")
    spark.stop()
  }
}
