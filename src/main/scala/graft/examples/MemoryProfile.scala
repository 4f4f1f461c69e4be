package graft.examples

import org.apache.spark.sql.functions.col

import graft.tree.{Criterion, DecisionTreeClassifier}

/** Peak-memory comparison of the two trainer execution modes — the analog
  * of the reference's memory benchmark (reference:
  * examples/memory_profiling.py:23-100, whose headline result is lazy
  * ~8 GB vs non-lazy ~12 GB vs sklearn ~15 GB peak):
  *
  *  - `cacheNodes = false` ~ the reference's LAZY path: every level
  *    re-derives its rows from the root scan through the routing
  *    expression; nothing is pinned, memory stays flat;
  *  - `cacheNodes = true` ~ the NON-LAZY path: the training frame persists
  *    (MEMORY_AND_DISK) for the duration of the build — faster rescans
  *    for deeper trees at the price of resident blocks.
  *
  * Peak driver-JVM heap is sampled at 50 ms ([[graft.PeakHeapSampler]]),
  * reset (with a forced GC) between modes. `sbt "runMain
  * graft.examples.MemoryProfile [sfDir]"`.
  */
object MemoryProfile {
  private val heap = new graft.PeakHeapSampler(50)

  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.make()
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag")
    for ((label, cache) <- Seq("lazy-recompute" -> false, "cached" -> true)) {
      System.gc()
      Thread.sleep(200)
      heap.reset()
      val t0 = System.nanoTime()
      val model = DecisionTreeClassifier(maxDepth = Some(4), criterion = Criterion.Entropy,
        maxBins = Some(32), cacheNodes = cache).fit(df, "l_returnflag")
      val n = graft.tree.Predict.predictMany(model, df).where(col("prediction").isNotNull).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[mem-profile] $label%-15s fit+predict ${secs}%5.1fs " +
        f"peak-heap ${heap.peakBytes / 1e9}%.2f GB (scored $n rows)")
    }
    spark.stop()
  }
}
