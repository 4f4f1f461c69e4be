package graft.tools

import org.apache.spark.sql.SparkSession

import graft.tree.{Criterion, DecisionTreeClassifier}

/** Dev probe for the wide190 heap-spread question (VERDICT r6 "What's
  * wrong #1": 3.9 / 5.84 / 15.87 GB sampled peaks across three harnesses
  * on IDENTICAL code). Separates the two things "peak heap" conflates:
  *
  *   - RAW sampled peak (`totalMemory - freeMemory`, what
  *     [[graft.PeakHeapSampler]] and the held lines report): live data
  *     PLUS every byte of not-yet-collected garbage. How high garbage
  *     piles before a young-gen evacuation depends on the collector's
  *     young-gen sizing, which G1 scales with -Xmx (up to 60% of heap)
  *     — so the SAME allocation profile samples to wildly different
  *     "peaks" under different harness heap sizes.
  *   - LIVE peak: old-gen occupancy immediately after each collection
  *     (`MemoryPoolMXBean.getCollectionUsage`), i.e. what survives GC —
  *     the number that would actually OOM an executor.
  *
  * Also reports GC event counts/time and per-run allocation estimate, so
  * the fit's ALLOCATION RATE (garbage/second) is pinned separately from
  * its live footprint.
  *
  * Usage: SPARK_DRIVER_MEM=8g|32g sbt "runMain graft.tools.WideHeapProbe [sfDir] [nDerived]"
  */
object WideHeapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nDerived = args.lift(1).map(_.toInt).getOrElse(186)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getType == java.lang.management.MemoryType.HEAP)
    val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala

    val rawPeak = new java.util.concurrent.atomic.AtomicLong(0L)
    val livePeak = new java.util.concurrent.atomic.AtomicLong(0L)
    val sampler = new Thread(() => {
      val rt = Runtime.getRuntime
      while (true) {
        rawPeak.updateAndGet(p => math.max(p, rt.totalMemory() - rt.freeMemory()))
        // sum of post-collection usages across heap pools = live set at
        // the last GC (0 until a pool's first collection)
        val live = pools.map(p => Option(p.getCollectionUsage).map(_.getUsed).getOrElse(0L)).sum
        livePeak.updateAndGet(p => math.max(p, live))
        Thread.sleep(50)
      }
    }, "wide-heap-probe-sampler")
    sampler.setDaemon(true)
    sampler.start()

    def gcSnapshot(): (Long, Long) =
      (gcs.map(_.getCollectionCount).sum, gcs.map(_.getCollectionTime).sum)

    val xmx = Runtime.getRuntime.maxMemory() / 1e9
    println(f"[wideheap] maxMemory (Xmx) = $xmx%.1f GB, collector(s) = ${gcs.map(_.getName).mkString(", ")}")

    // warmup + 2 measured runs of EXACTLY the bench wide190 workload
    (0 to 2).foreach { run =>
      rawPeak.set(0L); livePeak.set(0L)
      val (gc0, gct0) = gcSnapshot()
      val t0 = System.nanoTime()
      val wide = WideFrame.frame(spark, sfDir, nDerived,
        repartitionTo = Some(spark.sparkContext.defaultParallelism))
      val model = DecisionTreeClassifier(maxDepth = Some(4), criterion = Criterion.Entropy,
        maxBins = Some(32)).fit(wide, "l_returnflag")
      graft.tree.Predict.predictMany(model, wide)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val (gc1, gct1) = gcSnapshot()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      val label = if (run == 0) "warmup" else s"run$run"
      println(f"[wideheap] $label%-6s ${sec}%6.1fs  rawPeak=${rawPeak.get() / 1e9}%6.2fGB  " +
        f"livePeak=${livePeak.get() / 1e9}%6.2fGB  gcEvents=${gc1 - gc0}%4d  " +
        f"gcTime=${(gct1 - gct0) / 1000.0}%6.1fs")
    }
    spark.stop()
  }
}
