package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, Scoring}
import graft.functions.TextFunctions
import graft.tree.{Criterion, DecisionTreeClassifier}

/** Dev probe: measured time-vs-rows scaling curves for the heavy
  * operators (VERDICT r6 task #2 — convert "shaped for scale" into
  * "measured scaling").
  *
  * Generates a seed-pinned synthetic corpus in `target/scaling/` with the
  * testdata generator's shape (same columns, token-per-doc distribution,
  * small word vocabulary) at 1x (= sf0.1's 5k docs / 600k fit rows) and
  * 10x. The 10x corpus is SHARDED BY CONSTRUCTION: ten disjoint
  * vocabulary namespaces of 1x-identical statistics, the way a 10x
  * bigger crawl covers more topics rather than re-sampling the same 40
  * words — so candidate structures (shingle document frequencies, pair
  * counts, cluster sizes) scale linearly like a real corpus's, and a
  * quadratic blow-up in an operator shows up as a super-linear CURVE
  * rather than being baked into the data. Near-dup structure is planted
  * (every 50th doc gets an exact twin), so pair outputs are non-empty
  * and scale 10x.
  *
  * All randomness is `xxhash64`-derived from (id, salt) — deterministic,
  * partitioning-independent, no RNG state.
  *
  * Usage: sbt "runMain graft.tools.ScalingProbe [opFilter]"
  * Prints `[scaling] op nx rows sec` lines plus a `ratio10x` line per op
  * (elapsed(10x) / (10 * elapsed(1x)) — 1.0 is perfectly linear).
  */
object ScalingProbe {
  val Dir = "target/scaling"

  private def u(c: Column, salt: Int): Column =
    (abs(xxhash64(c, lit(salt))) % lit(1000000L)).cast("double") / lit(1000000.0)

  /** documents-shaped frame: `factor` vocabulary shards of `docsPerShard`
    * docs each + an exact twin for every 50th doc. */
  def genDocs(spark: SparkSession, factor: Int, docsPerShard: Int = 5000): DataFrame = {
    val vocabPerShard = 40
    val words = (0 until factor).flatMap(s => (0 until vocabPerShard).map(j => s"w${s}_$j"))
    val vocab = array(words.map(lit): _*)
    val base = spark.range(0L, factor.toLong * docsPerShard)
      .select(col("id").as("doc_id"),
        (col("id") / docsPerShard).cast("int").as("__shard"),
        (lit(10) + abs(xxhash64(col("id"), lit(1))) % 90).cast("int").as("__len"))
      .select(col("doc_id"),
        array_join(transform(sequence(lit(0), col("__len") - 1), i =>
          element_at(vocab,
            (col("__shard") * vocabPerShard
              + abs(xxhash64(col("doc_id"), i, lit(2))) % vocabPerShard + 1).cast("int"))),
          " ").as("text"))
    val twins = base.where(col("doc_id") % 50 === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
    base.unionAll(twins)
      .withColumn("lang", when(u(col("doc_id"), 3) < 0.7, "en").otherwise("de"))
      .withColumn("source", concat(lit("src"), (abs(xxhash64(col("doc_id"), lit(4))) % 5)))
      .withColumn("n_chars", length(col("text")))
  }

  /** lineitem-shaped numeric frame for the fit curve. */
  def genFit(spark: SparkSession, rows: Long): DataFrame =
    spark.range(0L, rows).select(
      (lit(1.0) + floor(u(col("id"), 10) * 50)).as("l_quantity"),
      round(lit(900.0) + u(col("id"), 11) * 99000, 2).as("l_extendedprice"),
      round(u(col("id"), 12) * 0.1, 2).as("l_discount"),
      round(u(col("id"), 13) * 0.08, 2).as("l_tax"),
      when(u(col("id"), 14) < 0.5, "N").when(u(col("id"), 14) < 0.75, "R")
        .otherwise("A").as("l_returnflag"))

  def main(args: Array[String]): Unit = {
    val opFilter = args.headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-scaling-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // generate once; reuse across runs (seed-pinned => identical)
    def ensure(path: String)(df: => DataFrame): Unit =
      if (!new java.io.File(path).exists())
        df.repartition(cpus.toInt).write.mode("overwrite").parquet(path)
    ensure(s"$Dir/docs_1x.parquet")(genDocs(spark, 1))
    ensure(s"$Dir/docs_10x.parquet")(genDocs(spark, 10))
    ensure(s"$Dir/fit_1x.parquet")(genFit(spark, 600000L))
    ensure(s"$Dir/fit_10x.parquet")(genFit(spark, 6000000L))

    def docs(nx: Int) = spark.read.parquet(s"$Dir/docs_${nx}x.parquet")
    def fitDf(nx: Int) = spark.read.parquet(s"$Dir/fit_${nx}x.parquet")

    val ops: Seq[(String, Int => Unit)] = Seq(
      ("jaccard_pairs", nx =>
        Dedup.jaccardPairs(docs(nx), "doc_id", "text", n = 3, threshold = 0.8)
          .write.format("noop").mode("overwrite").save()),
      ("minhash_lsh_pairs", nx =>
        Dedup.minHashLshJaccardPairs(docs(nx), "doc_id", "text",
            numHashes = 32, shingleN = 3, bands = 16, threshold = 0.8)
          .write.format("noop").mode("overwrite").save()),
      ("dedup_clusters", nx => {
        val d = docs(nx)
        val pairs = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
        Dedup.duplicateClusters(d.select("doc_id"), "doc_id", pairs)
          .write.format("noop").mode("overwrite").save()
      }),
      ("bigram_score", nx =>
        Scoring.bigramFrequencyScore(docs(nx), "doc_id", "text")
          .write.format("noop").mode("overwrite").save()),
      ("pack_sequences", nx => {
        val d = docs(nx).select(col("doc_id"),
          TextFunctions.wsTokenCount(col("text")).cast("long").as("n_tokens"))
        Packing.packByBudget(d, "doc_id", "n_tokens", budget = 2048L, numBuckets = 8)
          .write.format("noop").mode("overwrite").save()
      }),
      ("fit_depth4_entropy_scalable", nx => {
        val df = fitDf(nx)
        val model = DecisionTreeClassifier(maxDepth = Some(4),
          criterion = Criterion.Entropy, exactCumulativePartitions = Some(32))
          .fit(df, "l_returnflag")
        graft.tree.Predict.predictMany(model, df)
          .write.format("noop").mode("overwrite").save()
      }))

    def release(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; val s = (System.nanoTime() - t0) / 1e9
      release(); s
    }

    val docRows = Map(1 -> docs(1).count(), 10 -> docs(10).count())
    val fitRows = Map(1 -> fitDf(1).count(), 10 -> fitDf(10).count())

    ops.filter { case (name, _) => opFilter.forall(name.contains) }
      .foreach { case (name, body) =>
        val rows = if (name.startsWith("fit")) fitRows else docRows
        time(body(1)) // discarded warmup (codegen/JIT)
        val t1 = math.min(time(body(1)), time(body(1)))
        val t10 = math.min(time(body(10)), time(body(10)))
        val ratio = t10 / (10 * t1)
        println(f"[scaling] $name%-28s 1x ${rows(1)}%8d rows ${t1}%7.2fs   " +
          f"10x ${rows(10)}%8d rows ${t10}%7.2fs   ratio10x=${ratio}%5.2f")
      }

    // ---- incremental ingest dedup: FIXED batch, growing corpus ----
    // The production question is different from the curves above: what
    // does ONE ingest batch cost as the standing corpus grows 10x?
    // Three paths: re-shingle the corpus each batch (jaccardPairsAgainst),
    // probe the persisted index (full index scan), probe with the
    // batch-shingle IN pushdown (row-group-pruned scan). The batch is
    // 500 docs copied from corpus shard 0, so every batch doc has an
    // exact corpus near-dup and candidate volume is realistic.
    if (opFilter.forall("incremental_dedup".contains)) {
      val batch = docs(1).where(col("doc_id") < 500)
        .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
      for (nx <- Seq(1, 10)) {
        val corpus = docs(nx)
        val tbl = s"graft_scaling_shingle_${nx}x"
        graft.sources.IndexStore.writeBucketed(
          Dedup.shingleIndex(corpus, "doc_id", "text", n = 3), tbl, "shingle", 8)
        def idx = graft.sources.IndexStore.read(spark, tbl)
        // an "indexed_pruned" path (batch shingles as a literal IN on the
        // index scan) was measured here and REMOVED: 16.5-17.6 s vs the
        // plain indexed probe's 0.65-0.82 s — see the
        // jaccardPairsAgainstIndex scaladoc for the post-mortem
        val paths = Seq[(String, () => Unit)](
          ("reshingle", () => Dedup.jaccardPairsAgainst(batch, corpus, "doc_id", "text",
            n = 3, threshold = 0.8).write.format("noop").mode("overwrite").save()),
          ("indexed", () => Dedup.jaccardPairsAgainstIndex(batch, idx, "doc_id", "text",
            n = 3, threshold = 0.8).write.format("noop").mode("overwrite").save()))
        paths.foreach { case (label, body) =>
          time(body()) // warmup
          val t = math.min(time(body()), time(body()))
          println(f"[scaling] incremental_dedup/$label%-16s corpus ${nx}%2dx ${t}%7.2fs")
        }
      }
    }
    spark.stop()
  }
}
