package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KMeansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // three well-separated 2-d clusters around (0,0), (10,10), (-10,5)
  private def clustered = {
    val pts =
      (1L to 20L).map(i => (i, Seq(0.0 + (i % 5) * 0.01, 0.0 + (i % 7) * 0.01))) ++
      (21L to 40L).map(i => (i, Seq(10.0 + (i % 5) * 0.01, 10.0 + (i % 7) * 0.01))) ++
      (41L to 60L).map(i => (i, Seq(-10.0 + (i % 5) * 0.01, 5.0 + (i % 7) * 0.01)))
    pts.toDF("vec_id", "embedding")
  }

  test("lloyd converges onto separated clusters; counts partition the input") {
    // k-means can settle in a local optimum when all hash-ranked seeds land
    // in one cluster; scan a few fixed seeds for the well-separated one
    // (deterministic: the scan order and every run's result are pinned)
    val runs = (1L to 6L).map { seed =>
      KMeans.lloyd(clustered, "vec_id", "embedding", k = 3, iters = 5, seed = seed)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    }
    runs.foreach { out =>
      assert(out.length == 3 * 2, "k x dim rows")
      val counts = out.groupBy(_._1).map { case (c, rs) => c -> rs.head._4 }
      assert(counts.values.sum == 60, s"members must partition the input: $counts")
    }
    val balanced = runs.find { out =>
      out.groupBy(_._1).forall { case (_, rs) => rs.head._4 == 20L }
    }
    assert(balanced.isDefined, "no seed in 1..6 split the separated clusters 20/20/20")
    val centroids = balanced.get.groupBy(_._1).map { case (_, rs) =>
      rs.sortBy(_._2).map(_._3).toSeq
    }.toSet
    def near(c: Seq[Double], target: (Double, Double)) =
      math.abs(c(0) - target._1) < 0.1 && math.abs(c(1) - target._2) < 0.1
    assert(centroids.exists(near(_, (0.0, 0.0))) &&
      centroids.exists(near(_, (10.0, 10.0))) &&
      centroids.exists(near(_, (-10.0, 5.0))), s"centroids drifted: $centroids")
  }

  test("lloyd is deterministic: identical output across runs and partitionings") {
    val a = KMeans.lloyd(clustered, "vec_id", "embedding", k = 4, iters = 3, seed = 7L)
      .collect().map(_.toSeq).toSeq
    val b = KMeans.lloyd(clustered.repartition(7), "vec_id", "embedding", k = 4, iters = 3, seed = 7L)
      .collect().map(_.toSeq).toSeq
    assert(a == b, "result must not depend on input partitioning")
  }

  test("lloyd centroids feed ivfIndex: full-probe ANN stays exact") {
    val d = clustered
    val centroids = KMeans.centroidArrays(
      KMeans.lloyd(d, "vec_id", "embedding", k = 3, iters = 4, seed = 2L))
    val (index, cs) = Similarity.ivfIndex(d, "vec_id", "embedding",
      trainedCentroids = Some(centroids))
    assert(cs == centroids, "provided centroids must pass through untrained")
    // every vector landed in its nearest trained cell
    val rows = index.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1), r.getInt(2)))
    rows.foreach { case (_, v, cell) =>
      val dists = centroids.map(c =>
        c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(dists(cell) == dists.min, s"vector assigned to non-nearest cell $cell")
    }
    // probing all cells returns the exact nearest neighbor
    val q = Seq(10.0, 10.0)
    val top = Similarity.ivfTopK(index, centroids, q, nprobe = 3, k = 1).collect()
    assert(top.length == 1)
    val bruteBest = rows.minBy { case (_, v, _) =>
      -(v.zip(q).map { case (a, b) => a * b }.sum /
        (math.sqrt(v.map(x => x * x).sum) * math.sqrt(q.map(x => x * x).sum)))
    }._1
    assert(top.head.getLong(0) == bruteBest, "full-probe IVF must equal brute force")
  }

  test("broadcast (large-k) assignment is bit-identical to the literal-expression path") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(cutover: Int) =
      KMeans.lloyd(emb, "vec_id", "embedding", k = 8, iters = 2, seed = 42L,
          assignCutover = cutover)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3)))
        .toMap
    val viaExpr = run(cutover = 128) // k = 8 <= 128: literal-struct path
    val viaBroadcast = run(cutover = 0) // force the mapPartitions path
    assert(viaExpr == viaBroadcast,
      "both assignment paths must produce identical centroids and counts")
  }

  test("empty cells keep their seed centroid with n = 0") {
    // two identical points, k = 3: at least one cell can end up empty
    val d = Seq((1L, Seq(1.0, 1.0)), (2L, Seq(1.0, 1.0)), (3L, Seq(1.0, 1.0)))
      .toDF("vec_id", "embedding")
    val out = KMeans.lloyd(d, "vec_id", "embedding", k = 3, iters = 2, seed = 1L)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(out.length == 6)
    val emptyCells = out.groupBy(_._1).filter(_._2.head._4 == 0L)
    assert(emptyCells.nonEmpty, "duplicate-point input must leave empty cells")
    emptyCells.foreach { case (_, rs) =>
      rs.foreach { case (_, _, c, _) => assert(c == 1.0, "empty cell keeps its seed") }
    }
  }
}
