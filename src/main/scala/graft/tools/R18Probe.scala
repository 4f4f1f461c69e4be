// quick one-off: decompose the restructured incremental entries' cost
// (probe vs LPA vs dispatch) at a given sf dir
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Communities, Similarity}
import graft.sources.IndexStore

object R18Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-time-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val x = dir.replaceAll("[^A-Za-z0-9]", "_")

    def time(label: String)(body: => Unit): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      body
      println(f"[r18] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }

    // assumes TimeEntry/bench already built the standing tables in this
    // warehouse; rebuild cheaply if absent by running the catalog entry once
    graft.QueryCatalog.queries("knn_graph_incremental")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def batchEdges = {
      val nb = Similarity.autoNBits(e.where(col("vec_id") >= 100).count(), bands = 2)
      Similarity.knnGraphAgainstIndex(
        IndexStore.read(spark, "graft_sem_band_" + x),
        IndexStore.read(spark, "graft_sem_payload_" + x),
        IndexStore.read(spark, "graft_sem_params_" + x),
        e.where(col("vec_id") < 100), "vec_id", "embedding",
        k = 3, dim = 64, nBits = nb, bands = 2, rerankFactor = 4,
        signature = (c, n, d) => Similarity.lshSignatureMd5(c, n, d.get))
        .select(col("id"), col("nbr"))
    }
    def standingEdges = IndexStore.read(spark, "graft_sem_edges_" + x)
      .select(col("id"), col("nbr"))

    time("probe_only")(batchEdges.write.format("noop").mode("overwrite").save())
    time("probe_checkpointed_union_lpa") {
      val be = batchEdges.localCheckpoint(true)
      val labels = Communities.labelPropagation(
        standingEdges.unionByName(be), "id", "nbr", iterations = 4)
      Communities.communitySizes(labels).orderBy("label")
        .write.format("noop").mode("overwrite").save()
    }
    time("union_lpa_lazy_probe") {
      val labels = Communities.labelPropagation(
        standingEdges.unionByName(batchEdges), "id", "nbr", iterations = 4)
      Communities.communitySizes(labels).orderBy("label")
        .write.format("noop").mode("overwrite").save()
    }
    time("standing_only_lpa") {
      val labels = Communities.labelPropagation(
        standingEdges, "id", "nbr", iterations = 4)
      Communities.communitySizes(labels).orderBy("label")
        .write.format("noop").mode("overwrite").save()
    }
    def adjT = IndexStore.read(spark, "graft_sem_adj_" + x)
    def lblT = IndexStore.read(spark, "graft_sem_labels_" + x)
    time("full_on_adj") {
      val be = batchEdges.localCheckpoint(true)
      Communities.communitySizes(Communities.labelPropagationFromOnAdj(
          adjT, be, "id", "nbr", lblT, iterations = 4))
        .orderBy("label")
        .write.format("noop").mode("overwrite").save()
    }
    time("refresh_auto") {
      val be = batchEdges.localCheckpoint(true)
      val dirty = be.select(col("id").as("node"))
        .union(be.select(col("nbr").as("node"))).distinct()
      Communities.communitySizes(Communities.communityRefreshAuto(
          adjT, be, "id", "nbr", lblT, dirty, hops = 4, iterations = 4))
        .orderBy("label")
        .write.format("noop").mode("overwrite").save()
    }

    // ---- dup-cluster entry decomposition --------------------------------
    graft.QueryCatalog.queries("dedup_clusters_incremental_auto")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val batch = docs.where(col("doc_id") < 50)
    def vsStanding = graft.operators.Dedup.jaccardPairsAgainstIndex(
        batch, IndexStore.read(spark, "graft_dup_shidx_" + x),
        "doc_id", "text", n = 3, threshold = 0.8)
      .select(col("id_new").as("id_a"), col("id_corpus").as("id_b"))
    def within = graft.operators.Dedup.jaccardPairs(batch, "doc_id", "text",
        n = 3, threshold = 0.8)
      .select(col("id_a"), col("id_b"))
    time("dup_vs_standing")(vsStanding.write.format("noop").mode("overwrite").save())
    time("dup_within")(within.write.format("noop").mode("overwrite").save())
    time("dup_refresh_only") {
      val be = vsStanding.unionByName(within).localCheckpoint(true)
      val dirty = be.select(col("id_a").as("node"))
        .union(be.select(col("id_b").as("node"))).distinct()
      Communities.communitySizes(Communities.communityRefreshAuto(
          IndexStore.read(spark, "graft_dup_adj_" + x), be, "id_a", "id_b",
          IndexStore.read(spark, "graft_dup_labels_" + x), dirty,
          hops = 4, iterations = 4))
        .orderBy("label")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
