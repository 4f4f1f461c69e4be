package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PathsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")
  private def seeds(ns: Long*) = ns.toDF("node")

  private def run(e: org.apache.spark.sql.DataFrame,
      s: org.apache.spark.sql.DataFrame, hops: Int): Map[Long, Int] =
    Paths.bfsDistances(e, "src", "dst", s, "node", maxHops = hops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("chain distances from one end are the hop indices") {
    val out = run(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), seeds(1L), 4)
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4), s"got $out")
  }

  test("maxHops truncates the frontier, not the distances already found") {
    val out = run(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), seeds(1L), 2)
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2), s"got $out")
  }

  test("multi-source takes the minimum hop count per node") {
    // sources at both chain ends: the middle node is 1 hop from each
    val out = run(edges(1L -> 2L, 2L -> 3L), seeds(1L, 3L), 4)
    assert(out == Map(1L -> 0, 3L -> 0, 2L -> 1), s"got $out")
  }

  test("unreached components are absent; isolated seeds stay at dist 0") {
    val out = run(edges(1L -> 2L, 10L -> 11L), seeds(1L, 99L), 4)
    assert(out == Map(1L -> 0, 2L -> 1, 99L -> 0), s"got $out")
  }

  test("direction, duplicate edges, and self-loops are normalized away") {
    val out = run(
      edges(2L -> 1L, 1L -> 2L, 2L -> 1L, 1L -> 1L, 2L -> 3L), seeds(1L), 4)
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2), s"got $out")
  }

  test("early-stopping loop equals a larger fixed hop budget once exhausted") {
    val g = edges(1L -> 2L, 2L -> 3L)
    assert(run(g, seeds(1L), 3) == run(g, seeds(1L), 30))
  }

  test("duplicate seed rows collapse to one dist-0 row") {
    val out = run(edges(1L -> 2L), seeds(1L, 1L, 1L), 1)
    assert(out == Map(1L -> 0, 2L -> 1), s"got $out")
  }
}
