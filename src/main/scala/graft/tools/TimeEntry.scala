// quick one-off: time a named catalog entry at a given sf dir (noop write)
package graft.tools
import org.apache.spark.sql.SparkSession
object TimeEntry {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"${System.getProperty("java.io.tmpdir")}/graft-time-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.QueryCatalog.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      // match Bench's between-entry hygiene, or accumulated checkpoint
      // blocks from run1 (e.g. a standing-artifact build) poison run2+
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
