package graft.examples

import org.apache.spark.sql.functions._

import graft.operators.{Communities, Hits, LinkPrediction, PageRank, Triangles}

/** The graph-analytics family on the purchase graph (customers ->
  * suppliers via orders x lineitem) and the supplier co-supply graph —
  * the link-analysis signals a web-corpus curation pipeline derives
  * before sampling: PageRank authority (+ dangling-mass variant), HITS
  * hubs/authorities (role separation PageRank conflates), community
  * labels + modularity, link prediction, triangles and k-core density.
  * All exact-integer contracts: every number here is bit-stable under
  * any partitioning. Prints a summary; `sbt "runMain
  * graft.examples.GraphDemo"`. */
object GraphDemo {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.make()
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")

    // directed purchase graph: customer -> supplier (via shared order)
    val purchase = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(10000)).as("dst"))
    val nEdges = purchase.distinct().count()

    // 1. authority weighting: PageRank (with the dangling term — every
    //    supplier is dangling on this bipartite graph) and HITS (the
    //    role split: customers are hubs, suppliers authorities)
    val pr = PageRank.ranks(purchase, "src", "dst", iterations = 3,
      redistributeDangling = true)
    val topAuthority = pr.orderBy(col("rank_micro").desc).limit(3)
      .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(", ")
    val hits = Hits.scores(purchase, "src", "dst", iterations = 2)
    val roles = hits.agg(
      sum(when(col("hub_micro") > 0 && col("auth_micro") === 0, 1L).otherwise(0L)),
      sum(when(col("auth_micro") > 0 && col("hub_micro") === 0, 1L).otherwise(0L))
    ).head()
    val (nPureHubs, nPureAuths) = (roles.getLong(0), roles.getLong(1))

    // 2. structure: the sparse co-supply graph (suppliers sharing a
    //    high-quantity order) -> communities, density, link prediction
    val li = lineitem.where(col("l_quantity") >= 48)
      .select(col("l_orderkey"), col("l_suppkey"))
    val cosupply = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
      .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
    val labels = Communities.labelPropagation(cosupply, "src", "dst", iterations = 4)
    val nCommunities = labels.select("label").distinct().count()
    val modularity = Communities.modularity(cosupply, "src", "dst", labels)
      .head().getAs[Double]("modularity")
    // per-node participation sums each triangle 3x
    val triangles = Triangles.perNodeCounts(cosupply, "src", "dst")
      .agg(coalesce(sum("n_triangles"), lit(0L))).head().getLong(0) / 3L
    val suggested = LinkPrediction.scores(cosupply, "src", "dst",
      minCommon = 2L, maxDeg = Some(40L)).count()

    println(s"[graph] purchase edges=$nEdges; top PageRank authorities " +
      s"[$topAuthority]; HITS pure hubs=$nPureHubs pure authorities=$nPureAuths; " +
      f"co-supply communities=$nCommunities modularity=$modularity%.4f " +
      s"triangles=$triangles predicted-links=$suggested")
    require(nPureHubs > 0 && nPureAuths > 0,
      "bipartite purchase graph must split into pure hubs and authorities")
    require(nCommunities >= 1 && suggested >= 0)
    spark.stop()
  }
}
