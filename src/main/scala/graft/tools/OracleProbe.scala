package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Dev probe for the candidate+verify oracle designs (round 3): measures,
  * on the exact data the driver's correctness gate uses (sf0.01), whether
  * each approximate candidate generator covers 100% of the exact-verified
  * truth set — the precondition for giving those queries a DuckDB oracle.
  */
object OracleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // ---- truth: exact trigram jaccard pairs >= 0.8 --------------------------
    val truthPairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[probe] truth trigram-jaccard>=0.8 pairs: ${truthPairs.size}")

    // ---- minhash banding coverage -------------------------------------------
    for ((numHashes, bands) <- Seq((32, 8), (32, 16))) {
      val cand = Dedup.minHashLshPairs(docs, "doc_id", "text",
          numHashes = numHashes, shingleN = 3, bands = bands, threshold = 0.0)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val missed = truthPairs -- cand
      println(s"[probe] minhash $numHashes/$bands bands: candidates=${cand.size} missedTruth=${missed.size} $missed")
    }

    // ---- simhash hamming margin + chunk coverage ----------------------------
    val sims = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hams = truthPairs.toSeq.map { case (a, b) =>
      java.lang.Long.bitCount(sims(a) ^ sims(b))
    }.sorted
    val hamDist = hams.groupBy(identity).map { case (k, v) => k -> v.size }.toSeq.sortBy(_._1)
    println(s"[probe] simhash hamming over truth pairs: min=${hams.head} max=${hams.last} dist=$hamDist")
    def chunks(h: Long): Set[Int] = (0 until 4).map(b => ((h >> (b * 16)) & 0xFFFFL).toInt + (b << 16)).toSet
    val chunkMissed = truthPairs.filter { case (a, b) => (chunks(sims(a)) & chunks(sims(b))).isEmpty }
    println(s"[probe] simhash chunk-share missed truth pairs: ${chunkMissed.size} $chunkMissed")

    // ---- ann probe radius sweep ---------------------------------------------
    val q = emb.where(col("vec_id") === 0).head().getSeq[Float](1).map(_.toDouble)
    val truthTop = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    println(s"[probe] brute top10: $truthTop")
    for (nBits <- Seq(4, 6, 8)) {
      val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nBits = nBits, dim = Some(64))
        .localCheckpoint(true)
      val qSig = Similarity.lshSignatureLocal(q, nBits)
      for (radius <- 1 to 4) {
        // all signatures within hamming <= radius
        def ball(sig: Long, r: Int): Set[Long] =
          if (r == 0) Set(sig)
          else {
            val prev = ball(sig, r - 1)
            prev ++ prev.flatMap(s => (0 until nBits).map(b => s ^ (1L << b)))
          }
        val probes = ball(qSig, radius)
        val got = idx.where(col("bucket").isin(probes.toSeq: _*))
          .select(col("id"), Similarity.cosine(transform(col("vec"), x => x.cast("double")),
            array(q.map(lit): _*)).as("cosine"))
          .orderBy(col("cosine").desc, col("id").asc).limit(10)
          .collect().map(_.getLong(0)).toSeq
        val scanFrac = probes.size.toDouble / (1L << nBits)
        println(f"[probe] ann nBits=$nBits radius=$radius probes=${probes.size} " +
          f"scan=$scanFrac%.2f exactMatch=${got == truthTop}")
      }
    }
    spark.stop()
  }
}
