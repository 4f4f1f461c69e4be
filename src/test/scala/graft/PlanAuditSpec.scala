package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** The PLANS.md invariants as CI assertions: plan regressions (an
  * accidental cartesian, a lost parquet pushdown, a second sessionize
  * shuffle) fail `sbt test` instead of waiting for a human to re-run the
  * `graft.tools.PlanAudit` main. Plans are inspected with AQE disabled —
  * the audit targets the static plan (AQE's pre-runtime wrapper hides
  * exchange reuse and codegen annotations), matching the tool.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    val prev = kv.map { case (k, _) => k -> spark.conf.get(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  private def plan(df: DataFrame): String =
    withConf("spark.sql.adaptive.enabled" -> "false") {
      df.queryExecution.explainString(FormattedMode)
    }

  private def q(name: String): DataFrame = QueryCatalog.queries(name)(spark, sfDir)

  test("the cartesian detector fires on an injected crossJoin (suite-red proof)") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = plan(spark.range(3).toDF("a").crossJoin(spark.range(3).toDF("b")))
      assert(p.contains("CartesianProduct"),
        "detector must recognize a cartesian, or every assertion below is vacuous")
    }
  }

  test("no catalog query plans a CartesianProduct") {
    // topk_for_queries' BroadcastNestedLoopJoin is the documented
    // small-query-set brute scorer — a different node, still flagged if it
    // ever degrades to CartesianProduct.
    // Cost note: some builders do driver-side work at construction
    // (quantizer training, checkpoint materialization, the bucketed-table
    // write, the cluster convergence loops) — at sf0.001 that's seconds,
    // accepted for exhaustive sweep coverage.
    QueryCatalog.queries.keys.toSeq.sorted.foreach { name =>
      assert(!plan(q(name)).contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("split partition filters reach the parquet scan") {
    val p = plan(q("split_partition_left"))
    assert(p.contains("PushedFilters: [IsNotNull(l_discount), LessThanOrEqual(l_discount,0.05)]"),
      s"split filter must push to parquet:\n$p")
    assert(!p.contains("l_partkey"), "scan must prune to the selected columns")
  }

  test("sessionize runs on a single user-keyed shuffle") {
    val p = plan(q("sessionize"))
    assert("Arguments: hashpartitioning".r.findAllIn(p).size == 1,
      s"lag + cumsum + rollup must share one user-keyed exchange:\n$p")
  }

  test("batch ANN candidate join is a hash join, not a nested loop") {
    val p = plan(q("batch_ann_topk"))
    assert(p.contains("HashJoin") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("partitioned prefix sum reuses the histogram exchange and broadcasts offsets") {
    val p = plan(q("cum_counts_partitioned"))
    assert(p.contains("ReusedExchange"), "histogram shuffle must be computed once")
    assert(p.contains("BroadcastHashJoin"), "per-bucket offsets must broadcast back")
  }

  test("tfidf construction is lazy: the corpus count is in-plan, not an eager job") {
    // the parquet READ may cost a schema-inference job; the operator must not
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // drain pre-existing events so they can't be attributed to the build,
    // then register; drain again before reading the counter (a fixed
    // sleep can false-pass both ways on a loaded machine)
    org.apache.spark.sql.graft.ListenerBridge.waitUntilListenerBusEmpty(spark)
    spark.sparkContext.addSparkListener(listener)
    try {
      val built = graft.operators.Tfidf.topTerms(docs, "doc_id", "text", k = 3, minDf = 2)
      org.apache.spark.sql.graft.ListenerBridge.waitUntilListenerBusEmpty(spark)
      assert(jobs.get() == 0, s"building topTerms ran ${jobs.get()} Spark job(s) eagerly")
      // and the N it scores with is a plan-side aggregate, not a baked literal
      assert(built.queryExecution.optimizedPlan.toString.contains("count(distinct"),
        "corpus N must be computed in-plan")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("stratified quality filter broadcasts thresholds onto the corpus") {
    // per-stratum percentile rows are tiny; the corpus side must hash-join
    // against a broadcast, never shuffle for the join
    val p = plan(q("quality_filter_stratified"))
    assert(p.contains("BroadcastHashJoin"),
      s"stratum thresholds must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the threshold join:\n$p")
  }

  test("repetition signals are a pure projection - no exchange, no corpus pass") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = plan(graft.operators.Scoring.repetitionSignals(docs, "doc_id", "text"))
    assert(!p.contains("Exchange"),
      s"char-weighted repetition signals must run at scan speed with no shuffle:\n$p")
  }

  test("dataset_split assignment is a pure projection - no exchange") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = plan(graft.operators.Shuffling.assignSplit(
      docs, "doc_id", Seq("train" -> 0.8, "rest" -> 0.2), seed = 7L))
    assert(!p.contains("Exchange"),
      s"split assignment must run at scan speed with no shuffle:\n$p")
  }

  test("incremental dedup broadcasts the batch index onto the corpus") {
    val p = plan(q("dedup_incremental"))
    assert(p.contains("BroadcastHashJoin"),
      s"the ingest batch must broadcast; the corpus must not shuffle for the join:\n$p")
  }

  test("pair-candidate dedups shuffle ids only (no vector/signature payload)") {
    // embedding_neardup_lsh: the (id_a, id_b) dedup must not carry the
    // va/vb arrays through its exchange (the r4 verdict's #3 finding)
    val p = plan(q("embedding_neardup_lsh"))
    // a payload-free dedup is a HashAggregate node whose Keys are exactly
    // (id_a, id_b) and whose Results are exactly those two columns — a
    // vector-carrying dedup shows Results [4] (first(va), first(vb) tag along)
    val dedupAgg = "Keys \\[2\\]: \\[id_a[\\s\\S]{0,120}?id_b[\\s\\S]{0,300}?Results \\[2\\]".r
    assert(dedupAgg.findFirstIn(p).isDefined,
      s"candidate dedup must group (id_a, id_b) with no carried payload:\n$p")
  }

  test("walk skip-gram reader prunes the sink's step partitions") {
    // the delivery contract of randomWalksToSink: a window consumer
    // reads step IN [lo-w, hi+w] as a PARTITION filter (directory
    // pruning), never as a post-scan filter over the full corpus
    import spark.implicits._
    val e = (1L to 10L).map(i => i -> (i % 10 + 1)).toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("plan_walk_sg").toString
    graft.operators.Paths.randomWalksToSink(e, "src", "dst",
      walksPerNode = 1, steps = 4, path = dir)
    val p = plan(graft.operators.Paths.walkSkipgramPairs(
      spark, dir, window = 1, centerLo = 2, centerHi = 2))
    val pf = "PartitionFilters: \\[[^\\]]*step[^\\]]*\\]".r.findFirstIn(p)
    assert(pf.isDefined && !pf.get.contains("PartitionFilters: []"),
      s"the sink scan must carry a step partition filter:\n$p")
  }
}
