package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Dev smoke runner: exercises the dedup operators end-to-end on the
  * driver-provided testdata. Not part of the driver contract; used for
  * quick local verification (`sbt "runMain graft.tools.Smoke"`).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[smoke] documents rows=${docs.count()}")
    val exact = Dedup.exact(docs, "doc_id", "text")
    val dupGroups = exact.where(org.apache.spark.sql.functions.col("n_copies") > 1).count()
    println(s"[smoke] exact dedup groups=${exact.count()} dupGroups=$dupGroups")
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
    println(s"[smoke] jaccard(n=3,t=0.8) pairs=${jac.count()}")
    jac.show(5, truncate = false)
    val mh = Dedup.minHashLshPairs(docs, "doc_id", "text", numHashes = 32, shingleN = 3, bands = 8, threshold = 0.7)
    println(s"[smoke] minhash-lsh pairs=${mh.count()}")
    val sh = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
    println(s"[smoke] simhash pairs=${sh.count()}")
    // BPE artifact lifecycle: train on the corpus word counts, persist,
    // reload, segment with the RELOADED merges — the cross-run shape.
    val merges = graft.operators.Bpe.trainOnCorpus(docs, "text", numMerges = 200)
    val mPath = java.nio.file.Files.createTempFile("smoke_bpe", ".json").toString
    graft.operators.Bpe.saveMerges(merges, mPath)
    val reloaded = graft.operators.Bpe.loadMerges(mPath)
    require(reloaded == merges, "BPE merges must survive the save/load round trip")
    val seg = graft.operators.Bpe.segment(docs, "doc_id", "text", reloaded)
    val tok = seg.agg(org.apache.spark.sql.functions.sum("n_tokens")).head.getLong(0)
    println(s"[smoke] bpe merges=${merges.pairs.length} reloaded-segment tokens=$tok")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(mPath))
    spark.stop()
  }
}
