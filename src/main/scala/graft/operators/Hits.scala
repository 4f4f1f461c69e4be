package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointBridge

/** HITS hubs-and-authorities over a directed edge table (Kleinberg 1999,
  * public) — the second classic link-analysis weighting a web-corpus
  * curation pipeline uses besides [[PageRank]]: a page is a good
  * AUTHORITY if good hubs link to it, a good HUB if it links to good
  * authorities. On a crawl graph the authority score ranks content
  * pages and the hub score ranks directories/link farms — both useful
  * sampling signals, and the pair separates roles PageRank conflates.
  *
  * Determinism contract (the [[PageRank.ranks]] rule): scores live as
  * LONG micro-units (1e6 = 1.0) and every step is integer arithmetic.
  * Power iteration converges to the principal eigenvector direction
  * under ANY norm, so normalization is L-infinity (divide by the round
  * maximum, `raw * 1e6 div max`) instead of the classical L2 — the max
  * and the floor divisions are exactly replayable in DuckDB, where an
  * L2 norm would drag FP sqrt into every round. The update order is the
  * standard one: authorities from CURRENT hubs, then hubs from the NEW
  * authorities.
  *
  * Overflow budget: a node's raw score is at most (in-degree x 1e6), and
  * the scale multiply adds another 1e6, so the per-node bound is
  * in-degree x 1e12 — safe in a signed long up to ~9.2e6 in-edges per
  * node. Beyond that (mega-hubs on a 100 TB crawl), pre-cap the degree
  * with the [[LinkPrediction]] `maxDeg` discipline or drop the scale
  * factor a decade; the per-row `raise_error` guard on the scale step
  * makes the budget explicit rather than silently wrapping — a raw
  * round score past Long.MaxValue/1e6 fails the job loudly.
  *
  * Scale shape, per iteration: TWO shuffles — the dst-keyed authority
  * aggregate and the src-keyed hub aggregate, both map-side combined —
  * plus the per-round 1-row max frames, which join via explicit
  * `broadcast()` (a BroadcastNestedLoopJoin on a single row; zero extra
  * driver actions — the max never leaves the cluster). The edge table
  * checkpoints once and is re-read every round; superseded round states
  * release through [[CheckpointBridge]] (O(1) persisted copies).
  */
object Hits {

  /** `(node, hub_micro, auth_micro)` after `iterations` rounds, both
    * scores initialized to 1e6 for every node appearing as src or dst.
    * Nodes with no in-edges have authority 0 after round 1; nodes with
    * no out-edges have hub 0 (the bipartite extremes). Parallel edges
    * collapse (edge set is distinct); self-loops count as both an
    * in- and an out-edge, as in the paper. */
  def scores(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 2
  ): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    val e = edges
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("__src").as("__node"))
      .union(e.select(col("__dst").as("__node")))
      .distinct()
      .localCheckpoint(true)
    var state = nodes
      .select(col("__node"), lit(1000000L).as("__h"), lit(1000000L).as("__a"))
      .localCheckpoint(true)
    // the documented overflow budget, enforced: the scale step multiplies
    // the raw in/out-neighbor sum by 1e6, so any raw past Long.MaxValue/1e6
    // (~9.2e12, i.e. ~9.2e6 max-score in-edges on one node) would wrap
    // silently — fail the round loudly instead and point at the remedy.
    def guarded(raw: Column): Column = {
      val r = coalesce(raw, lit(0L))
      when(r > lit(Long.MaxValue / 1000000L),
        raise_error(concat(
          lit("Hits.scores: raw score exceeds the long overflow budget at node "),
          col("__node").cast("string"),
          lit(" — pre-cap degree (LinkPrediction maxDeg) or lower the scale"))))
        .otherwise(r)
    }
    for (_ <- 1 to iterations) {
      // authorities from current hubs: raw in-neighbor hub sum, then
      // L-inf normalize against the round max (1-row broadcast)
      val araw = e.join(state.select(col("__node"), col("__h")),
          e("__src") === col("__node"))
        .groupBy(col("__dst").as("__n")).agg(sum("__h").as("__raw"))
      val amax = araw.agg(greatest(coalesce(max("__raw"), lit(1L)), lit(1L))
        .as("__max"))
      // materialized once: the new authority table feeds BOTH the hub
      // aggregate and the round's output join
      val a = nodes.join(araw, col("__node") === col("__n"), "left")
        .crossJoin(broadcast(amax))
        .select(col("__node"),
          guarded(col("__raw")).as("__safe"), col("__max"))
        .select(col("__node"),
          expr("(__safe * 1000000L) div __max").as("__a"))
        .localCheckpoint(true)
      // hubs from the NEW authorities (standard HITS ordering)
      val hraw = e.join(a.select(col("__node").as("__an"), col("__a")),
          e("__dst") === col("__an"))
        .groupBy(col("__src").as("__n")).agg(sum("__a").as("__raw"))
      val hmax = hraw.agg(greatest(coalesce(max("__raw"), lit(1L)), lit(1L))
        .as("__max"))
      val next = nodes.join(hraw, col("__node") === col("__n"), "left")
        .crossJoin(broadcast(hmax))
        .select(col("__node"),
          guarded(col("__raw")).as("__safe"), col("__max"))
        .select(col("__node"),
          expr("(__safe * 1000000L) div __max").as("__h"))
        .join(a, Seq("__node"))
        .localCheckpoint(true)
      CheckpointBridge.release(state)
      CheckpointBridge.release(a)
      state = next
    }
    val out = state.select(col("__node").as("node"),
      col("__h").as("hub_micro"), col("__a").as("auth_micro"))
    CheckpointBridge.release(e)
    CheckpointBridge.release(nodes)
    out
  }
}
