package graft.tools

import org.apache.spark.sql.SparkSession
import graft.tree.{Criterion, DecisionTreeClassifier}

/** Dev timing probe for the exact+partitioned fit variant (the r3 bench
  * regression), mirroring Bench's fit_depth4_entropy_scalable setup. */
object ScalableFitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag")

    for (run <- 1 to 2; (label, cumBuckets) <- Seq("windowed" -> None, "partitioned" -> Some(32))) {
      val t0 = System.nanoTime()
      val model = DecisionTreeClassifier(maxDepth = Some(4), criterion = Criterion.Entropy,
        exactCumulativePartitions = cumBuckets).fit(df, "l_returnflag")
      val tFit = (System.nanoTime() - t0) / 1e9
      graft.tree.Predict.predictMany(model, df)
        .write.format("noop").mode("overwrite").save()
      val tAll = (System.nanoTime() - t0) / 1e9
      println(f"[scalable-fit] run $run $label: fit ${tFit}%.1fs total ${tAll}%.1fs")
    }
    spark.stop()
  }
}
