package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  test("hand graphs: triangle, square, K4") {
    // one triangle + a pendant edge
    val tri = Triangles.perNodeCounts(
      edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a 4-cycle has no triangles
    val square = Triangles.perNodeCounts(
      edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L), "src", "dst").collect()
    assert(square.isEmpty)
    // K4: 4 triangles, every node in 3 of them
    val k4 = Triangles.perNodeCounts(
      edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val total = Triangles.totalCount(
      edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L), "src", "dst")
      .collect().head.getLong(0)
    assert(total == 4L)
  }

  test("dirty input: duplicates, reversed edges, and self-loops are canonicalized") {
    val out = Triangles.perNodeCounts(
      edges(1L -> 2L, 2L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 2L), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("differential vs brute-force enumeration on a random graph") {
    val rnd = new scala.util.Random(42)
    val es = (1 to 400).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    val out = Triangles.perNodeCounts(edges(es: _*), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force over canonical undirected edges
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap { case (a, b) => Set(a, b) }.toSeq.sorted
    val expected = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      Seq(x, y, z) <- nodes.combinations(3)
      if und((x, y)) && und((y, z)) && und((x, z))
      n <- Seq(x, y, z)
    } expected(n) += 1
    assert(out == expected.toMap, "distributed counts must equal brute force")
  }

  test("clustering coefficient: clique 1.0, star center 0.0, mixed hand values") {
    // K4: every node coeff 1.0
    val k4 = Triangles.clusteringCoefficient(
      edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L), "src", "dst")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(k4.values.forall { case (d, t, c) => d == 3L && t == 3L && c == 1.0 })
    // star: center deg 3 coeff 0.0; leaves deg 1 dropped (undefined)
    val star = Triangles.clusteringCoefficient(
      edges(1L -> 2L, 1L -> 3L, 1L -> 4L), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(star == Map(1L -> 0.0), s"got $star")
    // triangle + pendant on node 3: coeff(3) = 2*1/(3*2) = 1/3
    val mixed = Triangles.clusteringCoefficient(
      edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(mixed(1L) == 1.0 && mixed(2L) == 1.0)
    assert(math.abs(mixed(3L) - 1.0 / 3) < 1e-12)
    assert(!mixed.contains(4L), "degree-1 vertices have no defined coefficient")
  }

  test("k-core: cascading peel reaches the fixpoint, not just one round") {
    // K4 {1..4} + a chain 4-5-6: under k=2 the chain peels in TWO rounds
    // (6 first, then 5 — 5's degree only drops after 6 leaves)
    val d = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L,
      4L -> 5L, 5L -> 6L)
    val core2 = Triangles.kCore(d, "src", "dst", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $core2")
    // k=4: K4 has max degree 3 — empty core
    assert(Triangles.kCore(d, "src", "dst", k = 4).collect().isEmpty)
    // a 5-cycle is exactly its own 2-core
    val cyc = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 1L)
    val c2 = Triangles.kCore(cyc, "src", "dst", k = 2).collect()
    assert(c2.length == 5 && c2.forall(_.getLong(1) == 2L))
  }

  test("k-core: differential vs brute-force peeling on a random graph") {
    val rnd = new scala.util.Random(9)
    val es = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val got = Triangles.kCore(edges(es: _*), "src", "dst", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute peel
    var und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    var changed = true
    while (changed) {
      val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= 4).keySet
      val next = und.filter { case (a, b) => keep(a) && keep(b) }
      changed = next != und
      und = next
    }
    val expected = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got == expected, s"got $got want $expected")
  }

  test("plan: equi-joins only — no cartesian, no nested loop") {
    val d = edges((1 to 200).map(i => (i.toLong, ((i * 7) % 200 + 1).toLong)): _*)
    val plan = Triangles.perNodeCounts(d, "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle counting must stay equi-join shaped:\n$plan")
  }

  test("kCore: non-convergence within maxRounds throws instead of over-reporting") {
    // a 10-node path at k=2 peels only from its two ends (~n/2 rounds):
    // after 2 rounds survivors still carry about-to-peel neighbors in
    // their degree, so returning them would violate the k-core contract
    val path = (1L to 9L).map(i => i -> (i + 1))
    val e = intercept[IllegalStateException] {
      Triangles.kCore(edges(path: _*), "src", "dst", k = 2, maxRounds = 2)
    }
    assert(e.getMessage.contains("converge"), e.getMessage)
    // with enough rounds the peel completes: a path has an empty 2-core
    assert(Triangles.kCore(edges(path: _*), "src", "dst", k = 2).collect().isEmpty)
  }

}
