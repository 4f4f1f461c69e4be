package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev timing probe for the witness-exact dedup materialization. */
object DdeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (run <- 1 to 2; name <- Seq("dedup_drop", "dedup_drop_exact")) {
      val t0 = System.nanoTime()
      graft.QueryCatalog.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[dde] run $run $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
