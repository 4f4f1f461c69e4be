package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LinkPredictionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  private def collectScores(d: org.apache.spark.sql.DataFrame,
      minCommon: Long = 1L, maxDeg: Option[Long] = None) =
    LinkPrediction.scores(d, "src", "dst", minCommon, maxDeg)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("hand path: the two ends of a 2-path are the only candidate") {
    // 1-2-3: candidate (1,3) via shared neighbor 2 (deg 2)
    val out = collectScores(edges(1L -> 2L, 2L -> 3L))
    assert(out.keySet == Set((1L, 3L)), s"got $out")
    val (cn, ra, j) = out((1L, 3L))
    assert(cn == 1L)
    assert(ra == 500000L, "1e6 div deg(2)=2")
    assert(j == 1.0, "deg 1 + deg 1 - 1 common = 1")
  }

  test("existing edges are never candidates; scores are exact on K4 minus an edge") {
    // K4 without edge (1,4): candidates exactly (1,4) via shared {2,3}
    val d = edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val out = collectScores(d)
    assert(out.keySet == Set((1L, 4L)), s"got $out")
    val (cn, ra, j) = out((1L, 4L))
    assert(cn == 2L)
    // deg(2)=deg(3)=3 -> 2 * (1e6 div 3) = 666666
    assert(ra == 666666L, s"got $ra")
    // deg(1)=2, deg(4)=2 -> 2/(2+2-2) = 1.0
    assert(j == 1.0)
  }

  test("minCommon filters single-wedge candidates") {
    // star 1-{2,3,4}: all leaf pairs share exactly one neighbor
    val d = edges(1L -> 2L, 1L -> 3L, 1L -> 4L)
    assert(collectScores(d).keySet ==
      Set((2L, 3L), (2L, 4L), (3L, 4L)))
    assert(collectScores(d, minCommon = 2L).isEmpty)
  }

  test("maxDeg cap: transparent when no node exceeds it, prunes hub wedges when it binds") {
    val d = edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(collectScores(d, maxDeg = Some(10L)) == collectScores(d),
      "cap above the max degree must be output-identical")
    // cap 2 excludes nodes 2 and 3 (deg 3) from the wedge-center role;
    // (1,4) loses both its wedges -> no candidates remain
    assert(collectScores(d, maxDeg = Some(2L)).isEmpty)
  }

  test("differential vs brute force on a random graph") {
    val rnd = new scala.util.Random(19)
    val es = (1 to 250).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    val out = collectScores(edges(es: _*))
    // brute force over canonical undirected adjacency
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nbrs = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
    val expected = (for {
      x <- nbrs.keys; z <- nbrs.keys
      if x < z && !und((x, z))
      shared = nbrs(x).intersect(nbrs(z))
      if shared.nonEmpty
    } yield {
      val ra = shared.toSeq.map(y => 1000000L / nbrs(y).size).sum
      val j = shared.size.toDouble / (nbrs(x).size + nbrs(z).size - shared.size)
      (x, z) -> ((shared.size.toLong, ra,
        BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }).toMap
    assert(out == expected, "distributed scores must equal brute force")
  }

  test("minCommon must be positive") {
    intercept[IllegalArgumentException] {
      LinkPrediction.scores(edges(1L -> 2L), "src", "dst", minCommon = 0L)
    }
  }
}
