package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev triage harness: time a comma-separated list of catalog entries in
  * ISOLATION (fresh JVM, one warmup + 3 timed runs each, min reported) —
  * the evidence a bench-gate breach triage needs to separate "this
  * entry's plan regressed" from "the box/interleave moved". Mirrors
  * [[graft.Bench]]'s session config and release discipline; prints one
  * line per entry.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.MiniBench entry1,entry2" */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq.empty)
    require(names.nonEmpty, "usage: MiniBench <entry,entry,...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-minibench-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def release(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None =>
          // Bench-only entries (the wide fits, BPE, pq_topk_trained,
          // batch_ivf_topk_nlist4096) have no catalog row; isolate them
          // with the SAME harness via the Bench dev knob instead:
          //   SPARK_GRAFT_BENCH_ONLY=<name> sbt "runMain graft.Bench"
          // (fresh JVM, warmup + min-of-3, warmup/gc_ms provenance).
          println(f"[minibench] $name%-44s MISSING from the catalog — " +
            "if bench-only, use SPARK_GRAFT_BENCH_ONLY=" + name +
            " runMain graft.Bench")
        case Some(fn) =>
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val s = (System.nanoTime() - t0) / 1e9
            release(); s
          }
          once() // warmup, discarded
          val times = Seq.fill(3)(once())
          println(f"[minibench] $name%-44s min=${times.min}%7.2fs  " +
            f"runs=${times.map(t => f"$t%.2f").mkString("/")}")
      }
    }
    spark.stop()
  }
}
