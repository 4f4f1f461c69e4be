package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev: run the driver-contract flagship exactly as the driver would. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.entry(spark).collect()
    println(f"[entry] rows=${rows.length} in ${(System.nanoTime() - t0) / 1e9}%.1fs: " +
      rows.map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
    spark.stop()
  }
}
