package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev: dump one query's formatted plan (name from args). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").config("spark.sql.adaptive.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.QueryCatalog.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
  }
}
