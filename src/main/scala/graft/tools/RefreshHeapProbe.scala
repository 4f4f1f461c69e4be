package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Communities

/** Dev probe for the r18 ADVICE driver-heap question: near the
  * broadcast/delta gates the driver-resident refresh path concurrently
  * holds several boxed GenericRow copies (canonical pairs, ~3x-batch
  * probes, ~2x deltaAdj, plus a per-hop frontier re-collected as a
  * LocalRelation) where the old join path held compact broadcast
  * blocks — is there heap headroom at exactly the refuse boundary, or
  * must the gate drop?
  *
  * Two gate-boundary scenarios through the PUBLIC front door:
  *  - `delta_gate`: a batch of exactly `DriverDeltaMaxPairs` disjoint
  *    NEW canonical pairs (the largest deriveDelta admits) against a
  *    tiny standing graph — the ball fraction is ~1.0, so the FULL
  *    branch runs (iterations=1): measures the delta machinery's
  *    driver residency at its maximum.
  *  - `frontier_gate`: the same batch size against a standing graph 4x
  *    larger, so the ball fraction is ~0.25 and the LOCAL branch runs
  *    with its frontier exactly AT `BroadcastFrontierMaxRows`:
  *    measures the frontier + restricted-rounds residency at its
  *    maximum.
  *
  * Prints raw sampled peak and post-GC live peak (the
  * [[graft.PeakHeapSampler]] distinction) per scenario, plus wall time.
  * Receipts live in SCALING.md.
  *
  * r19 receipts at the ORIGINAL 2^21 shared gate (8 GB heap, full
  * branch): 6.96 GB post-GC live / 190 s at 2^21 batch pairs and
  * 3.94 GB / 72 s at 2^20 — effectively exhausted, which is why the
  * gates dropped to DriverDeltaMaxPairs 2^19 / BroadcastFrontierMaxRows
  * 2^20.
  *
  * Usage: SPARK_DRIVER_MEM=8g sbt "runMain graft.tools.RefreshHeapProbe [nPairs]"
  */
object RefreshHeapProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val heap = new graft.PeakHeapSampler(50)

    /** Disjoint standing pairs well away from batch ids; returns
      * (adjacency, seeds) checkpointed fixtures. */
    def standing(nPairs: Long): (DataFrame, DataFrame) = {
      val pairs = spark.range(nPairs)
        .select((col("id") * 2 + 1000000000L).as("src"),
          (col("id") * 2 + 1000000001L).as("dst"))
      val adj = Communities.lpaAdjacency(pairs, "src", "dst")
        .localCheckpoint(true)
      val seeds = Communities.labelPropagation(pairs, "src", "dst",
        iterations = 1).localCheckpoint(true)
      (adj, seeds)
    }

    def scenario(name: String, batchPairs: Long, standingPairs: Long): Unit = {
      val (adj, seeds) = standing(standingPairs)
      // disjoint fresh pairs (2k, 2k+1): batchPairs canonical pairs,
      // 2*batchPairs new nodes, every component an isolated edge
      val batch = spark.range(batchPairs)
        .select((col("id") * 2).as("src"), (col("id") * 2 + 1).as("dst"))
      val dirty = spark.range(2 * batchPairs).select(col("id").as("node"))
      System.gc()
      heap.drain(); heap.drainLive()
      val t0 = System.nanoTime()
      val out = Communities.communityRefreshAuto(
        adj, batch, "src", "dst", seeds, dirty, hops = 1, iterations = 1)
      val n = out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      System.gc()
      println(f"[refresh-heap] $name%-14s batch=$batchPairs%8d standing=$standingPairs%8d " +
        f"out_rows=$n%9d wall=$secs%7.1fs raw_peak=${heap.drain() / 1e9}%5.2fGB " +
        f"live_peak=${heap.drainLive() / 1e9}%5.2fGB")
      Seq(out, adj, seeds).foreach(org.apache.spark.sql.graft.CheckpointBridge.release)
      spark.catalog.clearCache()
    }

    val batchPairs = args.headOption.map(_.toLong).getOrElse(1L << 19)
    // ball fraction ~1.0 -> FULL branch; delta residency at its max
    scenario("delta_gate", batchPairs, standingPairs = 10)
    // ball fraction ~0.25 -> LOCAL branch; frontier (2*batchPairs nodes)
    // exactly at BroadcastFrontierMaxRows when batchPairs = 2^19
    scenario("frontier_gate", batchPairs, standingPairs = 4 * batchPairs)
    spark.stop()
  }
}
