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

  // ---- labelPropagationFrom / labelPropagationLocal ----------------------

  private def seedsDf(pairs: (Long, Long)*) = pairs.toDF("node", "label")
  private def nodesDf(ns: Long*) = ns.toDF("node")

  private def runFrom(e: org.apache.spark.sql.DataFrame,
      s: org.apache.spark.sql.DataFrame, iters: Int = 4) =
    Communities.labelPropagationFrom(e, "src", "dst", s, iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def runLocal(e: org.apache.spark.sql.DataFrame,
      s: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame,
      hops: Int = 4, iters: Int = 4) =
    Communities.labelPropagationLocal(e, "src", "dst", s, d,
        hops = hops, iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagationFrom with own-id seeds equals labelPropagation " +
      "(including its round-1 closed form)") {
    val rnd = new scala.util.Random(23)
    val es = (1 to 250).map(_ => (rnd.nextInt(35).toLong, rnd.nextInt(35).toLong))
      .filter { case (a, b) => a != b }
    val e = edges(es: _*)
    val ns = es.flatMap { case (a, b) => Seq(a, b) }.distinct
    val ownIds = seedsDf(ns.map(n => n -> n): _*)
    assert(runFrom(e, ownIds) == run(e),
      "continuing from own-id seeds must be the cold-start result")
  }

  test("labelPropagationFrom: missing seed rows default to own id, " +
      "extra seed rows for absent nodes are ignored") {
    // only node 9 carries a seed; 9's label pulls its clique
    val e = edges(7L -> 8L, 8L -> 9L, 9L -> 7L)
    val out = runFrom(e, seedsDf(9L -> 1L, 999L -> 5L), iters = 4)
    assert(out.keySet == Set(7L, 8L, 9L), s"got $out")
    // votes: round 1 at node 7: labels {7, 8, 1(from 9)} -> tie, min = 1
    assert(out.values.toSet == Set(1L), s"the planted seed must win: $out")
  }

  test("labelPropagationLocal equals labelPropagationFrom when the frontier " +
      "covers the whole graph") {
    val rnd = new scala.util.Random(41)
    val es = (1 to 250).map(_ => (rnd.nextInt(35).toLong, rnd.nextInt(35).toLong))
      .filter { case (a, b) => a != b }
    val e = edges(es: _*)
    val ns = es.flatMap { case (a, b) => Seq(a, b) }.distinct
    // arbitrary non-converged seeds: label = node % 5
    val seeds = seedsDf(ns.map(n => n -> (n % 5)): _*)
    val full = runFrom(e, seeds, iters = 3)
    val local = runLocal(e, seeds, nodesDf(ns: _*), hops = 1, iters = 3)
    assert(local == full,
      s"dirty=all-nodes must reduce to the full refresh:\n $local\n vs $full")
  }

  test("labelPropagationLocal with converged seeds equals the full refresh " +
      "on the union graph (hops >= iterations)") {
    // standing graph: two triangles, fully converged by LPA
    val standing = edges(1L -> 2L, 2L -> 3L, 3L -> 1L,
      14L -> 15L, 15L -> 16L, 16L -> 14L)
    val seeds = Communities.labelPropagation(standing, "src", "dst", iterations = 4)
      .withColumnRenamed("label", "label")
    // ingest: a bridge 3-14 joins the cliques
    val union = edges(1L -> 2L, 2L -> 3L, 3L -> 1L,
      14L -> 15L, 15L -> 16L, 16L -> 14L, 3L -> 14L)
    val full = runFrom(union, seeds, iters = 4)
    val local = runLocal(union, seeds, nodesDf(3L, 14L), hops = 4, iters = 4)
    assert(local == full,
      s"blast-radius refresh diverged from the full refresh:\n $local\n vs $full")
  }

  test("labelPropagationLocal freezes nodes outside the blast radius by definition") {
    // long chain 1-2-...-8; seeds deliberately weird (all label 99 won't
    // appear: use per-node marker labels) — dirty only at node 1 with
    // hops=1 and 1 round, so nodes 3..8 MUST keep their seeds verbatim
    val chain = edges((1L to 7L).map(i => i -> (i + 1)): _*)
    val seeds = seedsDf((1L to 8L).map(i => i -> (100L + i)): _*)
    val out = runLocal(chain, seeds, nodesDf(1L), hops = 1, iters = 1)
    (3L to 8L).foreach { n =>
      assert(out(n) == 100L + n, s"node $n outside the frontier moved: $out")
    }
    // inside the frontier (nodes 1, 2) the vote ran: node 1 sees labels
    // {101 (self), 102 (nbr 2)} -> tie 1-1, smallest = 101
    assert(out(1L) == 101L, s"got $out")
    assert(out(2L) == 101L, s"node 2 sees {102 self, 101, 103} -> min on tie: $out")
  }

  test("labelPropagationLocal: dirty ids outside the graph are ignored " +
      "(empty frontier returns the seeds verbatim)") {
    val e = edges(1L -> 2L, 2L -> 3L)
    val seeds = seedsDf(1L -> 7L, 2L -> 7L, 3L -> 7L)
    val out = runLocal(e, seeds, nodesDf(999L), hops = 2, iters = 2)
    assert(out == Map(1L -> 7L, 2L -> 7L, 3L -> 7L), s"got $out")
  }

  test("labelPropagationLocalOnAdj equals labelPropagationLocal on the union graph " +
      "(persisted adjacency, overlapping batch edges deduplicated)") {
    val rnd = new scala.util.Random(67)
    val es = (1 to 300).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val standing = edges(es: _*)
    val seeds = Communities.labelPropagation(standing, "src", "dst", iterations = 4)
    // batch: two genuinely new edges to new nodes, one new edge between
    // standing nodes, and one edge that ALREADY stands (the
    // double-vote trap the dedup contract must close)
    val batch = edges(100L -> 101L, 5L -> 100L, 7L -> 11L, es.head)
    val dirty = nodesDf(100L, 101L, 5L, 7L, 11L, es.head._1, es.head._2)
    val viaAdj = Communities.labelPropagationLocalOnAdj(
        Communities.lpaAdjacency(standing, "src", "dst"),
        batch, "src", "dst", seeds, dirty, hops = 3, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = runLocal(standing.unionByName(batch), seeds, dirty,
      hops = 3, iters = 3)
    assert(viaAdj == direct,
      s"persisted-adjacency refresh diverged:\n $viaAdj\n vs $direct")
  }

  test("labelPropagationLocal is bit-exact under any partitioning") {
    val rnd = new scala.util.Random(59)
    val es = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val ns = es.flatMap { case (a, b) => Seq(a, b) }.distinct
    val seeds = seedsDf(ns.map(n => n -> (n % 7)): _*)
    val base = runLocal(edges(es: _*), seeds, nodesDf(0L, 1L, 2L), hops = 2, iters = 3)
    for (p <- Seq(1, 3, 13)) {
      val out = runLocal(edges(es: _*).repartition(p), seeds,
        nodesDf(0L, 1L, 2L), hops = 2, iters = 3)
      assert(out == base, s"partitioning $p changed the local refresh")
    }
  }
}
