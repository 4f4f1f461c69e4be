package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointBridge

/** Deterministic bounded-iteration PageRank over an edge table — the graph
  * primitive a web-corpus curation pipeline uses to weight documents by
  * link authority before sampling (Page et al. 1999, public).
  *
  * Determinism contract (the [[KMeans.lloyd]] rule): ranks live as LONG
  * micro-units (1e6 = 1.0) and every step is integer arithmetic —
  * per-edge contribution `rank div out_degree`, damping
  * `150000 + (85 * sum) div 100` — so a distributed sum's association
  * order cannot perturb the result and the driver's hash gate can compare
  * a floating-point-free replica in DuckDB iteration for iteration.
  * A plain double PageRank is partition-order-dependent in the 1-ulp tail;
  * this one is bit-exact under any partitioning (spec-asserted).
  *
  * Scale shape, per iteration: ONE shuffle keyed by `dst` (the
  * contribution aggregate, map-side combined) plus the ranks-to-edges
  * equi-join on `src` — the standard Pregel dataflow. The edge table is
  * localCheckpoint'ed ONCE and re-read every round; the rank state is one
  * row per node and each superseded round's checkpoint blocks are
  * released through [[CheckpointBridge]] (O(1) persisted copies, the
  * dedup-frontier discipline). Dangling nodes (no out-edges) leak their
  * mass under the default simple variant; [[ranks]]'
  * `redistributeDangling` flag adds the uniform redistribution term
  * (in the same exact-integer contract) for graphs where stationary
  * L1 mass matters — real web crawls, where dangling pages are common.
  */
object PageRank {

  /** `(node, rank_micro)` after `iterations` damped rounds. `rank_micro`
    * is the integer-scaled rank (1e6 = 1.0, initial value for every
    * node). Self-loops count; parallel edges collapse (edge set is
    * distinct).
    *
    * `redistributeDangling = true` closes the documented simple-variant
    * mass leak: each round, the total rank held by dangling nodes (no
    * out-edges) is split uniformly — every node's contribution sum gains
    * `dangling_sum div n` BEFORE damping, so stationary L1 mass is
    * (almost) conserved on real web graphs where dangling pages are
    * common. The per-round division's remainder (< n micro-units
    * globally) is dropped — the deterministic price of staying in exact
    * integer arithmetic; ranks remain bit-exact under any partitioning
    * and the DuckDB replica replays the same `//` floor. On a graph with
    * NO dangling nodes the share is 0 every round and the flag
    * reproduces the plain variant exactly (spec-asserted). Extra cost
    * per round: one broadcast-sized semi-join aggregate over the rank
    * table (a driver scalar), nothing keyed by edges. */
  def ranks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      redistributeDangling: Boolean = false
  ): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val e = edges
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    val edgesDeg = e.join(deg, "__src").localCheckpoint(true)
    val nodes = edgesDeg.select(col("__src").as("__node"))
      .union(edgesDeg.select(col("__dst").as("__node")))
      .distinct()
      .localCheckpoint(true)
    // the dangling node set is static (one anti-join, computed once);
    // nNodes is the redistribution divisor
    val dangling = if (redistributeDangling)
      nodes.join(edgesDeg.select(col("__src").as("__node")).distinct(),
          Seq("__node"), "left_anti")
        .localCheckpoint(true)
    else null
    val nNodes = if (redistributeDangling) math.max(1L, nodes.count()) else 1L
    var ranks = nodes.withColumn("__r", lit(1000000L)).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = edgesDeg
        .join(ranks, edgesDeg("__src") === ranks("__node"))
        .select(col("__dst").as("__node"), expr("__r div __deg").as("__c"))
        .groupBy("__node").agg(sum(col("__c")).as("__s"))
      // per-node dangling share: floor(dangling rank mass / n) — a
      // driver scalar (ranks are non-negative, so `div` == floor)
      val share = if (redistributeDangling) {
        val dsum = ranks.join(dangling, Seq("__node"), "left_semi")
          .agg(coalesce(sum("__r"), lit(0L))).head().getLong(0)
        dsum / nNodes
      } else 0L
      val next = nodes
        .join(contrib, Seq("__node"), "left")
        .select(col("__node"),
          (lit(150000L) +
            expr(s"(85 * (coalesce(__s, 0L) + ${share}L)) div 100")).as("__r"))
        .localCheckpoint(true)
      CheckpointBridge.release(ranks)
      ranks = next
    }
    // the final state is materialized in ranks' own checkpoint, so the
    // edge and node scaffolding can release immediately; the returned
    // frame's single checkpoint is the caller's to consume
    val out = ranks
      .select(col("__node").as("node"), col("__r").as("rank_micro"))
    CheckpointBridge.release(edgesDeg)
    CheckpointBridge.release(nodes)
    if (redistributeDangling) CheckpointBridge.release(dangling)
    out
  }

  /** Personalized PageRank: the teleport mass returns ONLY to the seed
    * set instead of every node — ranks measure proximity to the seeds
    * ("related entities", seed-anchored relevance for corpus slicing)
    * rather than global authority. Integer contract: seeds get the
    * 150000-micro teleport term, non-seeds 0, propagation unchanged —
    * so the oracle replica is one CASE away from the uniform one.
    * Same dataflow and checkpoint discipline as [[ranks]]; the seed
    * table broadcasts (seed sets are small by use-case). */
  def personalizedRanks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      iterations: Int = 3
  ): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val e = edges
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    val edgesDeg = e.join(deg, "__src").localCheckpoint(true)
    val seedSet = seeds.select(col(seedCol).cast("long").as("__node")).distinct()
    val nodes = edgesDeg.select(col("__src").as("__node"))
      .union(edgesDeg.select(col("__dst").as("__node")))
      .distinct()
      .join(broadcast(seedSet.withColumn("__seed", lit(1L))), Seq("__node"), "left")
      .select(col("__node"), coalesce(col("__seed"), lit(0L)).as("__seed"))
      .localCheckpoint(true)
    var ranks = nodes
      .select(col("__node"), (col("__seed") * 1000000L).as("__r"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = edgesDeg
        .join(ranks, edgesDeg("__src") === ranks("__node"))
        .select(col("__dst").as("__node"), expr("__r div __deg").as("__c"))
        .groupBy("__node").agg(sum(col("__c")).as("__s"))
      val next = nodes
        .join(contrib, Seq("__node"), "left")
        .select(col("__node"), col("__seed"),
          (col("__seed") * 150000L + expr("(85 * coalesce(__s, 0L)) div 100")).as("__r"))
        .localCheckpoint(true)
      CheckpointBridge.release(ranks)
      ranks = next
    }
    val out = ranks
      .select(col("__node").as("node"), col("__r").as("rank_micro"))
    CheckpointBridge.release(edgesDeg)
    CheckpointBridge.release(nodes)
    out
  }

  /** Weight-proportional PageRank: each source splits its rank across
    * out-edges proportionally to integer edge weights — per-edge
    * contribution `(rank * w) div W_src` — instead of uniformly. The
    * natural fit for co-occurrence graphs where multiplicity IS the
    * signal (how often two entities co-occur, how many links between
    * two hosts). Parallel input edges ADD their weights (vs the
    * unweighted variant's distinct-edge collapse); non-positive and
    * null weights drop. Same integer micro-unit determinism contract,
    * same per-iteration dataflow and O(1)-checkpoint discipline as
    * [[ranks]]. Long bound: `max_rank * max_weight` must stay under
    * 2^63 — at micro-unit ranks that allows per-edge weights up to
    * ~2^43 / n, far beyond any co-occurrence count. */
  def weightedRanks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iterations: Int = 3
  ): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val e = edges
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"),
        col(weightCol).cast("long").as("__w"))
      .where(col("__src").isNotNull && col("__dst").isNotNull &&
        col("__w").isNotNull && col("__w") > 0)
      .groupBy("__src", "__dst").agg(sum("__w").as("__w"))
    val wsum = e.groupBy("__src").agg(sum("__w").as("__ww"))
    val edgesW = e.join(wsum, "__src").localCheckpoint(true)
    val nodes = edgesW.select(col("__src").as("__node"))
      .union(edgesW.select(col("__dst").as("__node")))
      .distinct()
      .localCheckpoint(true)
    var ranks = nodes.withColumn("__r", lit(1000000L)).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = edgesW
        .join(ranks, edgesW("__src") === ranks("__node"))
        .select(col("__dst").as("__node"), expr("(__r * __w) div __ww").as("__c"))
        .groupBy("__node").agg(sum(col("__c")).as("__s"))
      val next = nodes
        .join(contrib, Seq("__node"), "left")
        .select(col("__node"),
          (lit(150000L) + expr("(85 * coalesce(__s, 0L)) div 100")).as("__r"))
        .localCheckpoint(true)
      CheckpointBridge.release(ranks)
      ranks = next
    }
    val out = ranks
      .select(col("__node").as("node"), col("__r").as("rank_micro"))
    CheckpointBridge.release(edgesW)
    CheckpointBridge.release(nodes)
    out
  }
}
