package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the 100 TB
  * quantizer trainer. [[Similarity.ivfIndex]] trains its coarse
  * quantizer on a bounded driver-side sample (the FAISS
  * train-on-sample shape); this closes the remaining caveat for
  * corpora whose diversity a 4096-vector sample under-represents:
  * every iteration is ONE distributed job over all vectors, and only
  * k x d centroid statistics ever reach the driver.
  *
  * Per-iteration dataflow:
  *   - assignment is a pure projection: per-centroid squared L2 via a
  *     left-fold `aggregate(zip_with(...))` against centroid literals,
  *     argmin by `array_min` over (distance, cell) structs — the same
  *     deterministic-tiebreak pattern as the IVF cell assignment
  *     (distance rounded to 9 dp, ties to the lower cell);
  *   - the centroid update is `posexplode` to (cell, dim, value) rows
  *     and one map-side-combined aggregate keyed (cell, dim): shuffle
  *     volume is k x d x partitions tiny partials, never vectors;
  *   - new means land on the driver (k x d decimals), next iteration's
  *     literals are rebuilt, empty cells keep their previous centroid.
  *
  * Determinism contract (what makes the DuckDB twin hash-exact and
  * results stable across partitionings, retries, and cluster sizes):
  * coordinates are pre-rounded to 6 dp, per-dimension sums run in
  * DECIMAL(18,6) (exact for 6-dp inputs in any accumulation order),
  * each mean is ONE double division then rounded back to 6 dp, and
  * the seed vectors are the hash-ranked top-k (md5(id:seed) — the
  * [[Shuffling.shuffleKey]] rule), not a partitioning-dependent
  * `takeSample`. Every rounding uses the same primitive formula
  * `floor(x * 1e6 + 0.5) / 1e6` — engine `round()` builtins disagree
  * at half-way boundaries (BigDecimal-string vs scaled-double
  * semantics), this sequence of IEEE ops does not.
  *
  * Output: one row per (cell, dim): the trained centroid component and
  * the cell's final member count (n = 0 rows carry the seed/previous
  * centroid — k is preserved, the FAISS empty-cell convention).
  *
  * Coordinates must be FINITE (the embeddings contract): a NaN/Inf
  * coordinate would flow through the floor-rounding differently per
  * engine, so feed such corpora through a finiteness filter first.
  */
object KMeans {

  /** `assignCutover`: above this k, the per-iteration assignment switches
    * from the k-struct literal expression (codegen'd, but the plan embeds
    * k x d literals and re-analyzes them every iteration — fine for
    * nlist <= a few hundred, a driver/analyzer bottleneck at
    * FAISS-realistic nlist >= 4096) to a broadcast-centroids
    * `mapPartitions` argmin whose plan size is O(1) in k. Both paths run
    * the same IEEE op sequence (left-fold squared L2, distance rounded
    * to 9 dp, ties to the lower cell), so results are bit-identical —
    * KMeansSpec asserts it by forcing each path on the same corpus. */
  def lloyd(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      seed: Long = 42L,
      assignCutover: Int = 128
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._

    def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    def r9(c: Column): Column = floor(c * lit(1e9) + lit(0.5)) / lit(1e9)

    val vecs = df.select(col(idCol).as("__id"), transform(col(vecCol), x => r6(x)).as("__v"))

    // hash-ranked seeds: deterministic in any layout, one tiny top-k job
    val seeds: Array[Array[Double]] = vecs
      .orderBy(Shuffling.shuffleKey(col("__id"), seed), col("__id"))
      .limit(k)
      .select("__v")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.length == k, s"need >= $k vectors to seed $k cells, got ${seeds.length}")
    val dim = seeds.head.length

    def assignExpr(centroids: Array[Array[Double]]): Column = {
      val cells = centroids.zipWithIndex.map { case (c, i) =>
        val d2 = aggregate(
          zip_with(col("__v"), lit(c), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)
        struct(r9(d2).as("d"), lit(i).as("cell"))
      }
      array_min(array(cells: _*)).getField("cell")
    }

    /** Broadcast-centroids assignment: same fold order, same 9-dp
      * rounding, same lower-cell tie-break as [[assignExpr]] — in a JVM
      * loop over a broadcast k x d array instead of k struct literals. */
    def assignBroadcast(centroids: Array[Array[Double]]): DataFrame = {
      val cb = spark.sparkContext.broadcast(centroids)
      vecs.select(col("__v")).as[Seq[Double]]
        .mapPartitions { it =>
          val cs = cb.value
          it.map { v =>
            val arr = v.toArray
            var bestCell = 0
            var bestD = Double.MaxValue
            var c = 0
            while (c < cs.length) {
              val cen = cs(c)
              var d2 = 0.0
              var j = 0
              while (j < arr.length) {
                val t = arr(j) - cen(j); d2 += t * t; j += 1
              }
              val d = math.floor(d2 * 1e9 + 0.5) / 1e9
              if (d < bestD) { bestD = d; bestCell = c } // ties keep lower cell
              c += 1
            }
            (bestCell, v)
          }
        }
        .toDF("cell", "__v")
    }

    var centroids = seeds
    var lastStats: Map[(Int, Int), (java.math.BigDecimal, Long)] = Map.empty
    (1 to iters).foreach { _ =>
      // two selects: posexplode's multi-alias breaks getField resolution
      // when they share one projection (FIELD_NOT_FOUND on the struct)
      val assigned =
        if (k > assignCutover) assignBroadcast(centroids)
        else vecs.select(assignExpr(centroids).as("cell"), col("__v"))
      val stats = assigned
        .select(col("cell"), posexplode(col("__v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(sum(col("x").cast("decimal(18,6)")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getDecimal(2), r.getLong(3))).toMap
      lastStats = stats
      centroids = Array.tabulate(k, dim) { (cell, d) =>
        stats.get((cell, d)) match {
          case Some((s, n)) =>
            // same IEEE op sequence as r6 and the DuckDB twin
            math.floor(s.doubleValue() / n * 1e6 + 0.5) / 1e6
          case None => centroids(cell)(d) // empty cell keeps its centroid
        }
      }
    }

    val rows = for (cell <- 0 until k; d <- 0 until dim) yield {
      val n = lastStats.get((cell, d)).map(_._2).getOrElse(0L)
      (cell, d, centroids(cell)(d), n)
    }
    rows.toDF("cell", "dim", "c", "n")
  }

  /** GROUPED Lloyd: train an independent k-means per value of `grpCol`
    * in ONE distributed job per iteration, instead of one [[lloyd]] run
    * (seed job + iters jobs) per group. The PQ trainer is the motivating
    * caller (r19 verdict #2): 8 per-subspace trainings were 24 sequential
    * jobs end-to-end; keyed by subspace they are 3 — and at 100 TB the
    * job-launch round trips, not the arithmetic, dominate a small-k
    * trainer, so the grouped shape is the scalable one for ANY
    * per-partition model family (per-subspace PQ, per-shard quantizers,
    * per-language centroids).
    *
    * Per-group semantics are BIT-IDENTICAL to running [[lloyd]] on that
    * group's rows alone (PqSpec asserts it against the composed 8-run
    * path): seeds are the group's hash-ranked top-k (`md5(id:seed)`
    * rank, ties by id — a per-group window instead of a global limit),
    * assignment is the same broadcast argmin loop (the
    * [[lloyd]]-`assignBroadcast` IEEE sequence: left-fold squared L2,
    * 9-dp rounding, ties to the lower cell — spec-pinned equal to the
    * literal-expression path), and the centroid update is the same
    * DECIMAL(18,6) grouped sum, now keyed (grp, cell, dim). Only
    * m x k x dim statistics reach the driver per iteration.
    *
    * `grpCol` must be int-castable; every group needs >= k rows.
    * Output: one row per (grp, cell, dim) with the trained component
    * and the cell's final member count. */
  def lloydGrouped(
      df: DataFrame,
      grpCol: String,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      seed: Long = 42L
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

    val vecs = df.select(col(grpCol).cast("int").as("__g"), col(idCol).as("__id"),
      transform(col(vecCol), x => r6(x)).as("__v"))

    // per-group hash-ranked seeds in one window job; cell = rank - 1,
    // exactly the order lloyd's orderBy+limit assigns
    val sw = org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))
      .orderBy(Shuffling.shuffleKey(col("__id"), seed), col("__id"))
    val seedRows = vecs
      .withColumn("__rk", row_number().over(sw)).where(col("__rk") <= k)
      .select(col("__g"), (col("__rk") - 1).as("cell"), col("__v"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    val groups = seedRows.keys.map(_._1).toArray.distinct.sorted
    require(groups.nonEmpty, "lloydGrouped: input has no rows")
    groups.foreach { g =>
      require((0 until k).forall(c => seedRows.contains((g, c))),
        s"group $g needs >= $k vectors to seed $k cells")
    }
    val dims: Map[Int, Int] = groups.map(g => g -> seedRows((g, 0)).length).toMap

    var centroids: Map[Int, Array[Array[Double]]] =
      groups.map(g => g -> Array.tabulate(k)(c => seedRows((g, c)))).toMap
    var lastStats: Map[(Int, Int, Int), (java.math.BigDecimal, Long)] = Map.empty
    (1 to iters).foreach { _ =>
      val cb = spark.sparkContext.broadcast(centroids)
      val assigned = vecs.select(col("__g"), col("__v")).as[(Int, Seq[Double])]
        .mapPartitions { it =>
          val cs = cb.value
          it.map { case (g, v) =>
            val arr = v.toArray
            val cents = cs(g)
            var bestCell = 0
            var bestD = Double.MaxValue
            var c = 0
            while (c < cents.length) {
              val cen = cents(c)
              var d2 = 0.0
              var j = 0
              while (j < arr.length) {
                val t = arr(j) - cen(j); d2 += t * t; j += 1
              }
              val d = math.floor(d2 * 1e9 + 0.5) / 1e9
              if (d < bestD) { bestD = d; bestCell = c } // ties keep lower cell
              c += 1
            }
            (g, bestCell, v)
          }
        }
        .toDF("__g", "cell", "__v")
      val stats = assigned
        .select(col("__g"), col("cell"), posexplode(col("__v")).as(Seq("dim", "x")))
        .groupBy("__g", "cell", "dim")
        .agg(sum(col("x").cast("decimal(18,6)")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
          (r.getDecimal(3), r.getLong(4))).toMap
      cb.destroy()
      lastStats = stats
      centroids = groups.map { g =>
        g -> Array.tabulate(k, dims(g)) { (cell, d) =>
          stats.get((g, cell, d)) match {
            case Some((s, n)) =>
              math.floor(s.doubleValue() / n * 1e6 + 0.5) / 1e6
            case None => centroids(g)(cell)(d) // empty cell keeps its centroid
          }
        }
      }.toMap
    }

    val rows = for {
      g <- groups.toSeq; cell <- 0 until k; d <- 0 until dims(g)
    } yield (g, cell, d, centroids(g)(cell)(d),
      lastStats.get((g, cell, d)).map(_._2).getOrElse(0L))
    rows.toDF("grp", "cell", "dim", "c", "n")
  }

  /** Collect a [[lloyd]] result back into the centroid-list shape
    * [[Similarity.ivfIndex]]'s `trainedCentroids` takes (k x d values —
    * tiny by construction). */
  def centroidArrays(lloydOut: DataFrame): Seq[Seq[Double]] = {
    val rows = lloydOut.select("cell", "dim", "c").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
  }
}
