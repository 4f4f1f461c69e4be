package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.tree.{Criterion, SplitSearch}

/** Dev probe: per-PHASE timing of the wide binned fit — separates the
  * plan/analysis cost of a ~190-column frame from the per-row costs of
  * each Spark job the fit runs (shrink agg, distinct targets, bin-edge
  * pass, one level-0 histogram job).
  *
  * History (r6): the original run of this probe, with the edge pass on
  * `df.stat.approxQuantile`, measured 173 s of a 190 s wide fit in that
  * single phase — the Dataset.rdd Row conversion re-boxes every double
  * of every row. The packed-array [[graft.functions.MultiQuantileSketch]]
  * replaced it; this probe now times the replacement (same GK summaries,
  * same error bound). It also showed the fold-of-withColumn construction
  * doubles downstream scan cost vs one flat select (nested Projects +
  * O(width^2) re-analysis), which is why Bench.wideFit uses the flat
  * select.
  *
  * Usage: sbt "runMain graft.tools.WidePhaseProbe [sfDir] [nDerived]"
  */
object WidePhaseProbe {
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

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[widephase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // built OUTSIDE any timed block: WideFrame.frame runs the eager
    // parquet footer/schema read, which is I/O, not the plan-analysis
    // cost this probe attributes (the shared construction is the same
    // one the bench entry uses)
    val wide: DataFrame =
      WideFrame.frame(spark, sfDir, nDerived, repartitionTo = Some(cpus.toInt))
    val features = wide.schema.fieldNames.filterNot(_ == "l_returnflag").toSeq

    t("count (scan baseline)") { wide.count() }
    t("maxAbs shrink agg") {
      val aggs = features.map(f => max(abs(col(f))).as(s"__ma_$f"))
      wide.agg(aggs.head, aggs.tail: _*).head()
    }
    t("distinct targets") {
      wide.select(col("l_returnflag")).distinct().orderBy(col("l_returnflag")).collect()
    }
    val edges = t("bin edges (packed sketch)") {
      val probs = (1 until 32).map(_.toDouble / 32)
      val packed = array(features.map(f => col(f).cast("double")): _*)
      val agg = graft.functions.MultiQuantileSketch(
        ColumnBridge.expression(packed), features.size, 1.0 / 128, probs)
      val qs: Seq[Seq[Double]] = wide
        .select(ColumnBridge.column(agg.toAggregateExpression()).as("qs"))
        .head().getSeq[scala.collection.Seq[Double]](0).map(_.toSeq)
      features.zip(qs.map(_.distinct.sorted)).filter(_._2.nonEmpty).toMap
    }
    val targets: Seq[Any] = Seq("A", "N", "R")
    t("level0 histogram job") {
      SplitSearch.searchLevelAggregated(wide, lit(0), 1, features, "l_returnflag",
        targets, Criterion.Entropy, edges)
    }
    t("full fit + predict") {
      val model = graft.tree.DecisionTreeClassifier(maxDepth = Some(4),
        criterion = Criterion.Entropy, maxBins = Some(32)).fit(wide, "l_returnflag")
      graft.tree.Predict.predictMany(model, wide)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
