package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.tree.{Criterion, DecisionTreeClassifier}

/** Dev timing probe for the 24-feature binned fit bench variant. */
object WideFitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val baseCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((baseCols :+ "l_returnflag").map(col): _*)
    val wide = (0 until 20).foldLeft(base) { (d, i) =>
      d.withColumn(s"f_$i", col(baseCols(i % 4)) * (1.0 + i * 0.1) + i)
    }
    for (run <- 1 to 3) {
      val t0 = System.nanoTime()
      val model = DecisionTreeClassifier(maxDepth = Some(4), criterion = Criterion.Entropy,
        maxBins = Some(32)).fit(wide, "l_returnflag")
      graft.tree.Predict.predictMany(model, wide)
        .write.format("noop").mode("overwrite").save()
      println(f"[wide-fit] run $run: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
