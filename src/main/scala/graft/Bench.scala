package graft

import org.apache.spark.sql.SparkSession

import graft.tree.{Criterion, DecisionTreeClassifier}

/** Benchmark main: times every registered query plus a depth-4 tree fit on
  * the scale dir, printing ONE JSON line for the driver.
  *
  * Queries are forced through a `noop`-format write (full evaluation of
  * every output column) rather than `count()` — Catalyst prunes unreferenced
  * computed columns under count, which would flatter expression-heavy
  * queries.
  *
  * Methodology: a discarded warmup pass absorbs session/JIT cold start,
  * then every entry reports the MEDIAN of 3 runs (total = sum of medians).
  * Single cold runs swung 0.13x-4.7x round-over-round on unchanged
  * sub-second queries, putting the noise floor above the 2x perf gate.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed-index tables (batch_ann_topk_bucketed) land in tmp, not cwd
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-bench-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Elapsed seconds, or -1 when the query failed — a failure must stay
      * visible in the JSON, not read as a suspiciously fast success. */
    def timeOnce(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try { body; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable => System.err.println(s"[bench] failed: $e"); -1.0 }
    }

    /** Session hygiene between runs: the pair/ANN operators materialize
      * their indices with eager `localCheckpoint(true)` and nothing frees
      * those RDD blocks. In a single long-lived bench session they
      * accumulated across all ~40 entries (peak heap climbed 2.0→5.9→7.8 GB
      * across rounds and trivial queries drifted up with unchanged code).
      * Dropping persistent blocks and cached relations outside the timed
      * region makes each measurement a plan measurement, not a measurement
      * of accumulated session state.
      */
    def release(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    /** Median of 3 runs; any failed run poisons the entry to -1. */
    def time(body: => Unit): Double = {
      val ts = Seq.fill(3) { val t = timeOnce(body); release(); t }
      if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(1)
    }

    // Discarded warmup: session/codegen/parquet-footer cold start lands
    // here instead of in the alphabetically first query's numbers.
    timeOnce {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
    }
    release()

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = time {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    // The headline ML workload: depth-4 entropy fit on lineitem numeric
    // features + single-pass batch predict, reference EP1+EP2 shape.
    // Exact mode = reference-parity candidate set (every distinct value);
    // bins32 = the scale path (quantile-binned thresholds).
    val fitVariants = Seq(
      ("fit_depth4_entropy", None, None),               // exact, windowed cum
      ("fit_depth4_entropy_scalable", None, Some(32)),  // exact, partitioned prefix sums
      ("fit_depth4_entropy_bins32", Some(32), None))    // quantile-binned
    for ((label, bins, cumParts) <- fitVariants) {
      results(label) = time {
        val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag")
        val model = DecisionTreeClassifier(maxDepth = Some(4), criterion = Criterion.Entropy,
          maxBins = bins, exactCumulativePartitions = cumParts).fit(df, "l_returnflag")
        graft.tree.Predict.predictMany(model, df)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // Width scaling: the reference's flagship table is 190 columns. Derive
    // 24 numeric features and fit binned level-wise — the
    // MultiFeatureHistogram path costs one un-melted pass per level
    // regardless of feature count, which is what makes wide tables viable
    // (the melt formulation multiplies rows by #features+1).
    results("fit_depth4_entropy_bins32_wide24") = time {
      val baseCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select((baseCols :+ "l_returnflag").map(org.apache.spark.sql.functions.col): _*)
      val wide = (0 until 20).foldLeft(base) { (d, i) =>
        d.withColumn(s"f_$i",
          org.apache.spark.sql.functions.col(baseCols(i % 4)) * (1.0 + i * 0.1) + i)
      }
      val model = DecisionTreeClassifier(maxDepth = Some(4), criterion = Criterion.Entropy,
        maxBins = Some(32)).fit(wide, "l_returnflag")
      graft.tree.Predict.predictMany(model, wide)
        .write.format("noop").mode("overwrite").save()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val peakGb = heap.peakBytes / 1e9
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"peak_heap_gb":$peakGb%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }

  private val heap = new PeakHeapSampler(100)
}
