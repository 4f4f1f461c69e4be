package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HitsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def edges(rows: Seq[(Long, Long)], parts: Int = 4): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), parts),
      StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))

  private def run(df: DataFrame, iters: Int): Map[Long, (Long, Long)] =
    Hits.scores(df, "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** driver-side reference with the identical integer arithmetic:
    * auth from current hubs, hub from the NEW auths, L-inf normalize. */
  private def reference(es: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val e = es.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var h = nodes.map(_ -> 1000000L).toMap
    var a = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val araw = e.groupBy(_._2).map { case (d, in) => d -> in.map(x => h(x._1)).sum }
      val amax = math.max(if (araw.isEmpty) 1L else araw.values.max, 1L)
      a = nodes.map(n => n -> araw.getOrElse(n, 0L) * 1000000L / amax).toMap
      val hraw = e.groupBy(_._1).map { case (s, out) => s -> out.map(x => a(x._2)).sum }
      val hmax = math.max(if (hraw.isEmpty) 1L else hraw.values.max, 1L)
      h = nodes.map(n => n -> hraw.getOrElse(n, 0L) * 1000000L / hmax).toMap
    }
    nodes.map(n => n -> (h(n), a(n))).toMap
  }

  test("hand-computed two-round scores on a 4-node chain-into-star graph") {
    // 1 -> 3, 2 -> 3, 3 -> 4: nodes 1,2 are pure hubs, 4 a pure authority,
    // 3 both. Hand arithmetic (micro-units):
    //   r1: araw(3)=2e6, araw(4)=1e6; a=(0,0,1e6,5e5)
    //       hraw(1)=hraw(2)=1e6, hraw(3)=5e5; h=(1e6,1e6,5e5,0)
    //   r2: araw(3)=2e6, araw(4)=5e5; a=(0,0,1e6,25e4)
    //       hraw(1)=hraw(2)=1e6, hraw(3)=25e4; h=(1e6,1e6,25e4,0)
    val es = Seq(1L -> 3L, 2L -> 3L, 3L -> 4L)
    val got = run(edges(es), 2)
    assert(got == Map(
      1L -> (1000000L, 0L),
      2L -> (1000000L, 0L),
      3L -> (250000L, 1000000L),
      4L -> (0L, 250000L)), s"got $got")
    assert(got == reference(es, 2))
  }

  test("matches the driver reference on a denser random graph, 3 rounds") {
    val rnd = new scala.util.Random(42)
    val es = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    assert(run(edges(es), 3) == reference(es, 3))
  }

  test("partitioning-independent: 1 vs 13 partitions, bit-identical") {
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(150)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    assert(run(edges(es, 1), 2) == run(edges(es, 13), 2))
  }

  test("bipartite graph: sources are pure hubs, sinks pure authorities") {
    val es = Seq(1L -> 10L, 1L -> 11L, 2L -> 10L, 3L -> 12L)
    val got = run(edges(es), 2)
    assert(Seq(1L, 2L, 3L).forall(n => got(n)._2 == 0L), s"got $got")
    assert(Seq(10L, 11L, 12L).forall(n => got(n)._1 == 0L), s"got $got")
    // the double-covered authority dominates
    assert(got(10L)._2 == 1000000L)
  }

  test("invariants: scores in [0, 1e6] and each round's max normalizes to exactly 1e6") {
    val rnd = new scala.util.Random(99)
    val es = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val got = run(edges(es), 3)
    assert(got.values.forall { case (h, a) =>
      h >= 0L && h <= 1000000L && a >= 0L && a <= 1000000L }, s"out of range: $got")
    // L-inf normalization: the arg-max node carries exactly 1e6 per axis
    assert(got.values.map(_._1).max == 1000000L, "hub max must normalize to 1e6")
    assert(got.values.map(_._2).max == 1000000L, "auth max must normalize to 1e6")
  }

  test("parallel edges collapse and self-loops count") {
    val base = Seq(1L -> 2L, 1L -> 2L, 2L -> 2L)
    assert(run(edges(base), 2) == run(edges(base.distinct), 2))
    assert(run(edges(base), 2) == reference(base, 2))
  }
}
