package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction (Liben-Nowell & Kleinberg 2003;
  * resource-allocation index from Zhou et al. 2009 — both public) —
  * scores NON-edges by how strongly the existing graph suggests them.
  * Pipeline uses: recommend merge candidates two near-dup clusters
  * apart, surface entity pairs an ER pass should re-examine, complete
  * co-occurrence graphs before community detection.
  *
  * Scores, all exact under the integer contract:
  *  - `common_neighbors` = |N(x) ∩ N(z)| (exact long);
  *  - `resource_alloc_micro` = Σ_{y ∈ N(x) ∩ N(z)} 1e6 div deg(y)
  *    (each shared neighbor donates its unit of "resource" split
  *    evenly over its edges; integer micro-units, so the distributed
  *    sum is association-order-free and the oracle replays `//`);
  *  - `jaccard` = cn / (deg(x) + deg(z) - cn), ONE IEEE division on
  *    exact integers then round(6) — identical in any engine.
  *
  * Scale shape: candidate pairs come from WEDGE enumeration — the
  * bidirectional adjacency self-joined on the shared neighbor `y`, tips
  * ordered `x < z` — then one aggregate keyed by the pair and an
  * anti-join against the edge set. No cartesian anywhere; the joins are
  * equi-joins on vertex ids carrying (long, long) rows. The cost is
  * Σ_y deg(y)², the same wedge budget as naive triangle counting: a hub
  * of degree d emits d² candidate rows. `maxDeg` caps it — nodes above
  * the cap are excluded from the WEDGE-CENTER role only (they still
  * appear as endpoints and in degrees), the standard stop-hub treatment
  * (a near-universal hub certifies nothing about its leaves anyway —
  * same reasoning as the dedup family's `maxDf` stop-shingle cap). At
  * 100 TB pass a cap; the sparse-graph catalog entry exercises None and
  * the capped contract is spec-pinned.
  */
object LinkPrediction {

  /** `(node_a, node_b, common_neighbors, resource_alloc_micro, jaccard)`
    * for every unconnected pair sharing >= `minCommon` neighbors,
    * `node_a < node_b`. Input edges may be dirty (directed, duplicated,
    * self-looped) — canonicalized first. */
  def scores(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      minCommon: Long = 1L,
      maxDeg: Option[Long] = None
  ): DataFrame = {
    require(minCommon >= 1L, s"minCommon must be >= 1, got $minCommon")
    val und = Triangles.canonicalEdges(edges, srcCol, dstCol)
    val adj = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
    val deg = adj.groupBy("node").agg(count(lit(1)).as("deg"))
    // wedge centers: every node, minus the capped hubs when maxDeg is set
    val centerDeg = maxDeg match {
      case Some(cap) => deg.where(col("deg") <= cap)
      case None      => deg
    }
    // adjacency seen from the wedge center, carrying the center's degree
    val fromCenter = adj
      .join(centerDeg.select(col("node"), col("deg").as("deg_y")), Seq("node"))
    val left = fromCenter.select(
      col("node").as("y"), col("deg_y"), col("nbr").as("node_a"))
    val right = fromCenter.select(
      col("node").as("y"), col("nbr").as("node_b"))
    val pairs = left.join(right, Seq("y"))
      .where(col("node_a") < col("node_b"))
      .groupBy("node_a", "node_b")
      .agg(count(lit(1)).as("common_neighbors"),
        sum(expr("1000000L div deg_y")).as("resource_alloc_micro"))
      .where(col("common_neighbors") >= minCommon)
    // drop pairs that are already edges (candidates are canonical a < b,
    // so one anti-join direction suffices)
    val nonEdges = pairs.join(und,
      pairs("node_a") === und("a") && pairs("node_b") === und("b"), "left_anti")
    nonEdges
      .join(deg.select(col("node").as("node_a"), col("deg").as("deg_a")), Seq("node_a"))
      .join(deg.select(col("node").as("node_b"), col("deg").as("deg_b")), Seq("node_b"))
      .select(col("node_a"), col("node_b"), col("common_neighbors"),
        col("resource_alloc_micro"),
        round(col("common_neighbors") /
          (col("deg_a") + col("deg_b") - col("common_neighbors")), 6).as("jaccard"))
  }
}
