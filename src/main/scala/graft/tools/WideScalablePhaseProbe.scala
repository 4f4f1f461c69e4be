package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tree.{Criterion, SplitSearch}

/** Dev probe: per-PHASE timing + GC attribution for the wide SCALABLE
  * (pipeline, useAggregatedHistogram=false) binned fit — the r20 driver
  * record priced fit_depth4_entropy_scalable_wide190 at 111.5 s on
  * local[32] (vs 29.9 s on local[8] and a 21.9-27.9 s builder receipt),
  * with peak_heap 52.6 GB vs the builder's 6.5 GB: the heap size the
  * harness grants (SPARK_DRIVER_MEM) is part of the repro. This probe
  * times the bin-edge sketch, one level-0 winners frame (the repeated
  * unit), and the full fit, printing the GC-time delta per phase so an
  * allocation-rate pathology is attributable.
  *
  * Usage: SPARK_GRAFT_CPUS=32 java -Xmx64g ... graft.tools.WideScalablePhaseProbe [sfDir] [nDerived]
  */
object WideScalablePhaseProbe {
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

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def t[A](label: String)(body: => A): A = {
      val g0 = gcMs(); val t0 = System.nanoTime()
      val r = body
      println(f"[wsphase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  gc=${(gcMs() - g0) / 1e3}%6.2fs")
      r
    }

    val wide: DataFrame =
      WideFrame.frame(spark, sfDir, nDerived, repartitionTo = Some(cpus.toInt))
    val features = wide.schema.fieldNames.filterNot(_ == "l_returnflag").toSeq
    val targets: Seq[Any] = Seq("A", "N", "R")

    t("count (scan baseline)") { wide.count() }
    def sketch(preProject: Boolean): Map[String, Seq[Double]] = {
      import org.apache.spark.sql.graft.ColumnBridge
      val probs = 0.0 +: (1 until 32).map(_.toDouble / 32) :+ 1.0
      val packed = array(features.map(f => col(f).cast("double")): _*)
      val (src, child) =
        if (preProject) (wide.select(packed.as("__arr")), col("__arr"))
        else (wide, packed)
      val agg = graft.functions.MultiQuantileSketch(
        ColumnBridge.expression(child), features.size, 1.0 / 128, probs)
      val qs: Seq[Seq[Double]] = src
        .select(ColumnBridge.column(agg.toAggregateExpression()).as("qs"))
        .head().getSeq[scala.collection.Seq[Double]](0).map(_.toSeq)
      features.zip(qs.map(q =>
        if (q.isEmpty) q else q.drop(1).dropRight(1).distinct.sorted))
        .filter(_._2.nonEmpty).toMap
    }
    t("sketch inline-array cold") { sketch(preProject = false) }
    t("sketch inline-array warm") { sketch(preProject = false) }
    t("sketch pre-projected cold") { sketch(preProject = true) }
    t("sketch pre-projected warm") { sketch(preProject = true) }
    val edges = sketch(preProject = true)
    val cached = wide.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("cache count") { cached.count() }
    def noop(d: DataFrame): Unit = d.write.format("noop").mode("overwrite").save()
    for (run <- 1 to 2) {
      t(s"run$run histogram only") {
        noop(SplitSearch.meltedHistogramIdx(
          cached.withColumn("__node", lit(0).cast("int")),
          features, "l_returnflag", targets, edges, Seq("__node")))
      }
      t(s"run$run level0 winners frame") {
        noop(SplitSearch.searchLevelFrame(cached, lit(0), features, "l_returnflag",
          targets, Criterion.Entropy, binEdges = edges))
      }
    }
    cached.unpersist(blocking = true)
    val model = t("fit only") {
      graft.tree.DecisionTreeClassifier(maxDepth = Some(4),
        criterion = Criterion.Entropy, maxBins = Some(32),
        useAggregatedHistogram = false).fit(wide, "l_returnflag")
    }
    t("predict only") {
      graft.tree.Predict.predictMany(model, wide)
        .write.format("noop").mode("overwrite").save()
    }
    t("fit again (warm)") {
      graft.tree.DecisionTreeClassifier(maxDepth = Some(4),
        criterion = Criterion.Entropy, maxBins = Some(32),
        useAggregatedHistogram = false).fit(wide, "l_returnflag")
    }
    spark.stop()
  }
}
