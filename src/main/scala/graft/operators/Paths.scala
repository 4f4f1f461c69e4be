package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointBridge

/** Hop-distance computations over the canonical undirected graph — the
  * ego-network / blast-radius primitive: "everything within k hops of
  * these seeds" drives contamination spread analysis (how far does a
  * leaked benchmark document's near-dup neighborhood reach through the
  * link graph), crawl frontier scoping, and seed-set expansion for
  * graph-sampled training mixtures.
  *
  * Determinism contract (the [[PageRank]] rule): distances are exact
  * integers produced by synchronous frontier rounds, so the result is
  * bit-exact under any partitioning and a fixed-depth SQL unroll
  * replays it round for round. Unlike [[Triangles.kCore]]'s `maxRounds`
  * (a budget whose truncation would silently change the answer, hence
  * the throw there), `maxHops` here IS the semantic — a hop-bounded
  * neighborhood — and rounds past frontier exhaustion are no-ops, so
  * the early-stopping loop equals the fixed unroll (the kcore-oracle
  * idempotence argument).
  *
  * Scale shape, per round: the frontier (one row per newly-reached
  * node) equi-joins the adjacency — which is localCheckpoint'ed ONCE,
  * pre-partitioned and pre-sorted on the join key so every round's
  * sort-merge join reuses the stored layout and only the frontier
  * shuffles (the [[Communities.labelPropagation]] adjacency rule) —
  * then one distinct aggregate and one anti-join against the visited
  * set, both keyed by node. Visited state is one row per reached node;
  * superseded checkpoints are released through [[CheckpointBridge]]
  * (O(1) persisted copies). Hub nodes cost degree rows in the
  * candidate explode, collapsed by the distinct's map-side combine.
  */
object Paths {

  /** Multi-source BFS: `(node, dist)` for every node within `maxHops`
    * undirected hops of any source, `dist` = exact minimum hop count
    * (sources themselves at 0). Edge direction, duplicate edges, and
    * self-loops are normalized away; sources absent from the edge set
    * are still emitted at dist 0 (an isolated seed has a defined,
    * empty neighborhood — it just never expands). */
  def bfsDistances(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      sources: DataFrame,
      sourceCol: String,
      maxHops: Int
  ): DataFrame = {
    require(maxHops >= 1 && maxHops <= 30,
      s"maxHops must be in [1, 30], got $maxHops")
    val und = Triangles.canonicalEdges(edges, srcCol, dstCol)
    // bidirectional adjacency, stored partitioned+sorted on the probe
    // key: each round's frontier join then reuses the layout and only
    // the frontier side exchanges
    val adj = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
      .repartition(col("node"))
      .sortWithinPartitions("node")
      .localCheckpoint(true)
    var visited = sources.select(sources(sourceCol).as("node")).distinct()
      .withColumn("dist", lit(0))
      .localCheckpoint(true)
    var frontier = visited.select("node").localCheckpoint(true)
    var d = 0
    var exhausted = frontier.isEmpty
    while (!exhausted && d < maxHops) {
      d += 1
      val next = frontier.join(adj, Seq("node"))
        .select(col("nbr").as("node"))
        .distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(true)
      exhausted = next.isEmpty
      if (!exhausted) {
        val grown = visited
          .unionByName(next.withColumn("dist", lit(d)))
          .localCheckpoint(true)
        CheckpointBridge.release(visited)
        CheckpointBridge.release(frontier)
        visited = grown
        frontier = next
      } else {
        CheckpointBridge.release(next)
      }
    }
    CheckpointBridge.release(frontier)
    CheckpointBridge.release(adj)
    visited
  }
}
