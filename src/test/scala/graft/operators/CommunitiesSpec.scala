package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CommunitiesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  private def run(d: org.apache.spark.sql.DataFrame, iters: Int = 4) =
    Communities.labelPropagation(d, "src", "dst", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by one bridge edge resolve to two communities") {
    // K3 {1,2,3} -- bridge 3-4 -- K3 {4,5,6}
    val out = run(edges(1L -> 2L, 2L -> 3L, 3L -> 1L,
      3L -> 4L, 4L -> 5L, 5L -> 6L, 6L -> 4L))
    assert(Set(out(1L), out(2L), out(3L)).size == 1, s"left clique split: $out")
    assert(Set(out(4L), out(5L), out(6L)).size == 1, s"right clique split: $out")
    assert(out(1L) != out(4L), s"bridge merged the cliques: $out")
  }

  test("a clique converges to its smallest member's label in one round") {
    val out = run(edges(7L -> 8L, 8L -> 9L, 9L -> 7L), iters = 1)
    assert(out == Map(7L -> 7L, 8L -> 7L, 9L -> 7L), s"got $out")
  }

  test("self-vote damps the bipartite 2-cycle oscillation") {
    // plain synchronous LPA on an edge {1,2} swaps labels forever
    // (round parity decides the answer); with the self-vote each node
    // sees a 1-1 tie and the SMALLEST label wins on both sides — a
    // fixpoint from round 1, so even/odd round counts agree
    val even = run(edges(1L -> 2L), iters = 2)
    val odd = run(edges(1L -> 2L), iters = 3)
    assert(even == odd, s"round parity changed the result: $even vs $odd")
    assert(even == Map(1L -> 1L, 2L -> 1L), s"got $even")
  }

  test("dirty input: duplicates, reversed edges, and self-loops are canonicalized") {
    val clean = run(edges(1L -> 2L, 2L -> 3L))
    val dirty = run(edges(1L -> 2L, 2L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 3L))
    assert(clean == dirty, s"$clean vs $dirty")
  }

  test("bit-exact under any partitioning") {
    val rnd = new scala.util.Random(7)
    val es = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val base = run(edges(es: _*))
    for (p <- Seq(1, 3, 13)) {
      val out = Communities.labelPropagation(
        edges(es: _*).repartition(p), "src", "dst", iterations = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == base, s"partitioning $p changed the labels")
    }
  }

  test("every returned label is a member node id within the label's community") {
    val rnd = new scala.util.Random(11)
    val es = (1 to 200).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val out = run(edges(es: _*))
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSet
    assert(out.keySet == nodes, "every node must be labeled")
    assert(out.values.toSet.subsetOf(nodes), "labels must be node ids")
  }

  test("modularity: hand values on the two-clique graph, exact integer form") {
    // K3 {1,2,3} -- bridge 3-4 -- K3 {4,5,6}: m=7; the LPA labeling
    // splits the cliques, intra=6 (only the bridge crosses);
    // degrees: nodes 3,4 have 3, others 2 -> d_c = 2+2+3 = 7 per side
    // q_num = 4*7*6 - (49+49) = 70; q_den = 196; Q = 70/196 = 0.357143
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 6L -> 4L)
    val labels = Communities.labelPropagation(e, "src", "dst")
    val r = Communities.modularity(e, "src", "dst", labels).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((7L, 6L, 70L, 196L)), s"got $r")
    assert(r.getDouble(4) == 0.357143, s"got $r")
  }

  test("modularity: everything in one community scores 0, singletons score negative") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L)
    import org.apache.spark.sql.functions.lit
    val one = e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
      .distinct().withColumn("label", lit(1L))
    val rOne = Communities.modularity(e, "src", "dst", one).collect().head
    // intra = m -> q_num = 4m^2 - (2m)^2 = 0
    assert(rOne.getLong(2) == 0L && rOne.getDouble(4) == 0.0, s"got $rOne")
    val singletons = one.withColumn("label", col("node"))
    val rSing = Communities.modularity(e, "src", "dst", singletons).collect().head
    assert(rSing.getLong(2) < 0L && rSing.getDouble(4) < 0.0, s"got $rSing")
  }

  test("communitySizes rolls up members with min/max witnesses") {
    val labels = Communities.labelPropagation(
      edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 10L -> 11L), "src", "dst")
    val sizes = Communities.communitySizes(labels)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(sizes(1L) == ((3L, 1L, 3L)), s"got $sizes")
    assert(sizes(10L) == ((2L, 10L, 11L)), s"got $sizes")
  }

  private def components(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Communities.connectedComponents(d, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connectedComponents: a chain collapses to its minimum (multi-round contraction)") {
    // a 6-node path needs more than one large/small-star round — the
    // case the single-join clique oracle can't reach
    val out = components(edges(6L -> 5L, 5L -> 4L, 4L -> 3L, 3L -> 2L, 2L -> 1L))
    assert(out == (1L to 6L).map(_ -> 1L).toMap, s"got $out")
  }

  test("connectedComponents: disjoint cliques keep disjoint minima") {
    val out = components(edges(1L -> 2L, 2L -> 3L, 3L -> 1L,
      7L -> 8L, 8L -> 9L, 9L -> 7L))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L), s"got $out")
  }

  test("connectedComponents: direction, duplicates, and self-loops are normalized") {
    val out = components(edges(2L -> 1L, 1L -> 2L, 1L -> 1L, 3L -> 2L))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $out")
  }
}
