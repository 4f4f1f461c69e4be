package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PageRankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def edges(rows: Seq[(Long, Long)], parts: Int = 4): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), parts),
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))

  private def run(df: DataFrame, iters: Int): Map[Long, Long] =
    PageRank.ranks(df, "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** driver-side reference with the identical integer arithmetic */
  private def reference(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = es.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val sums = e.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(n => n -> (150000L + 85L * sums.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("hand-computed two-iteration ranks on a 3-node cycle graph") {
    val es = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L)
    assert(run(edges(es), 1) ==
      Map(1L -> 1000000L, 2L -> 575000L, 3L -> 1425000L))
    assert(run(edges(es), 2) ==
      Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("dangling node receives rank but leaks its own mass (documented variant)") {
    // 1 -> 2; node 2 has no out-edges
    val got = run(edges(Seq(1L -> 2L)), 1)
    assert(got == Map(1L -> 150000L, 2L -> 1000000L))
  }

  test("parallel edges collapse; self-loops count") {
    val got = run(edges(Seq(1L -> 2L, 1L -> 2L, 2L -> 2L)), 1)
    // deg(1)=1, deg(2)=1(self); contrib to 2: 1e6 (from 1) + 1e6 (self)
    assert(got(2L) == 150000L + 85L * 2000000L / 100L)
  }

  test("differential vs driver reference on a random graph, bit-exact") {
    val rnd = new scala.util.Random(7)
    val es = (0 until 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    assert(run(edges(es), 4) == reference(es, 4))
  }

  test("partitioning-independent (the integer-arithmetic contract)") {
    val rnd = new scala.util.Random(11)
    val es = (0 until 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val a = run(edges(es, parts = 1), 3)
    val b = run(edges(es, parts = 17), 3)
    assert(a == b && a.nonEmpty)
  }

  test("iteration bound is enforced") {
    intercept[IllegalArgumentException] {
      PageRank.ranks(edges(Seq(1L -> 2L)), "src", "dst", 0)
    }
  }

  private def wEdges(rows: Seq[(Long, Long, Long)], parts: Int = 4): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), parts),
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType),
        StructField("w", LongType))))

  test("weighted ranks: weight-proportional split vs a driver-side replica") {
    // node 1 sends 3/4 of its rank to 2 and 1/4 to 3; 2 and 3 loop back
    val es = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val got = PageRank.weightedRanks(wEdges(es), "src", "dst", "w", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replica with identical integer arithmetic
    val nodes = Seq(1L, 2L, 3L)
    val wsum = es.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val sums = es.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _, w) => r(s) * w / wsum(s) }.sum }
      r = nodes.map(n => n -> (150000L + 85L * sums.getOrElse(n, 0L) / 100L)).toMap
    }
    assert(got == r, s"got $got want $r")
    assert(got(2L) > got(3L), "the heavier edge must carry more rank")
  }

  test("personalized ranks: mass concentrates near seeds; all-seed equals uniform") {
    import org.apache.spark.sql.functions.col
    // 1 -> 2 -> 3 -> 4 chain with a back edge 4 -> 1; seed {1}
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    def seedDf(ids: Long*) = spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(Row(_)), 2),
      StructType(Seq(StructField("node", LongType))))
    val ppr = PageRank.personalizedRanks(edges(es), "src", "dst", seedDf(1L), "node", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replica with the seed-only teleport
    var r = Map(1L -> 1000000L, 2L -> 0L, 3L -> 0L, 4L -> 0L)
    for (_ <- 1 to 3) {
      val sums = es.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => r(s) / 1L }.sum } // all degrees 1
      r = Seq(1L, 2L, 3L, 4L).map(n =>
        n -> ((if (n == 1L) 150000L else 0L) + 85L * sums.getOrElse(n, 0L) / 100L)).toMap
    }
    assert(ppr == r, s"got $ppr want $r")
    // only the seed carries the teleport term; the chain nodes hold only
    // propagated mass (the r0 wave is at node 4 after exactly 3 hops)
    assert(ppr(1L) >= 150000L && ppr(4L) == 614125L && ppr(2L) == 127500L)
    // seeding EVERY node reproduces the uniform variant bit-for-bit
    val all = PageRank.personalizedRanks(edges(es), "src", "dst",
        seedDf(1L, 2L, 3L, 4L), "node", 3)
      .collect().map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
    assert(all == run(edges(es), 3))
  }

  test("weighted ranks: parallel edges add weight; uniform weights equal the unweighted variant") {
    // duplicate (1,2) edges sum to weight 2 == a single weight-2 edge
    val dup = PageRank.weightedRanks(
      wEdges(Seq((1L, 2L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 1L, 1L), (3L, 1L, 1L))),
      "src", "dst", "w", 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = PageRank.weightedRanks(
      wEdges(Seq((1L, 2L, 2L), (1L, 3L, 2L), (2L, 1L, 1L), (3L, 1L, 1L))),
      "src", "dst", "w", 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup == merged)
    // all-ones weights reproduce the unweighted distinct-edge variant
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L)
    val uni = PageRank.weightedRanks(wEdges(es.map { case (s, d) => (s, d, 1L) }),
      "src", "dst", "w", 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uni == run(edges(es), 3))
  }

  test("dangling redistribution: hand-computed 1->2; no-dangling graph reproduces plain ranks") {
    // bipartite 1->2: node 2 is dangling, n=2 — three rounds replayed by
    // hand with the exact integer arithmetic (share = dsum div 2):
    //   r=(575000,1425000) -> (755625,1244375) -> (678858,1321140)
    val got = PageRank.ranks(edges(Seq(1L -> 2L)), "src", "dst", 3,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 678858L, 2L -> 1321140L), s"got $got")
    // a cycle has no dangling nodes: the flag must be an exact no-op
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val redist = PageRank.ranks(edges(es), "src", "dst", 3,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(redist == run(edges(es), 3))
  }

}
