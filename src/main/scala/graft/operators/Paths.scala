package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointBridge

/** Hop-distance computations over the canonical undirected graph — the
  * ego-network / blast-radius primitive: "everything within k hops of
  * these seeds" drives contamination spread analysis (how far does a
  * leaked benchmark document's near-dup neighborhood reach through the
  * link graph), crawl frontier scoping, and seed-set expansion for
  * graph-sampled training mixtures.
  *
  * Determinism contract (the [[PageRank]] rule): distances are exact
  * integers produced by synchronous frontier rounds, so the result is
  * bit-exact under any partitioning and a fixed-depth SQL unroll
  * replays it round for round. Unlike [[Triangles.kCore]]'s `maxRounds`
  * (a budget whose truncation would silently change the answer, hence
  * the throw there), `maxHops` here IS the semantic — a hop-bounded
  * neighborhood — and rounds past frontier exhaustion are no-ops, so
  * the early-stopping loop equals the fixed unroll (the kcore-oracle
  * idempotence argument).
  *
  * Scale shape, per round: the frontier (one row per newly-reached
  * node) equi-joins the adjacency — which is localCheckpoint'ed ONCE,
  * pre-partitioned and pre-sorted on the join key so every round's
  * sort-merge join reuses the stored layout and only the frontier
  * shuffles (the [[Communities.labelPropagation]] adjacency rule) —
  * then one distinct aggregate and one anti-join against the visited
  * set, both keyed by node. Visited state is one row per reached node;
  * superseded checkpoints are released through [[CheckpointBridge]]
  * (O(1) persisted copies). Hub nodes cost degree rows in the
  * candidate explode, collapsed by the distinct's map-side combine.
  */
object Paths {

  /** Multi-source BFS: `(node, dist)` for every node within `maxHops`
    * undirected hops of any source, `dist` = exact minimum hop count
    * (sources themselves at 0). Edge direction, duplicate edges, and
    * self-loops are normalized away; sources absent from the edge set
    * are still emitted at dist 0 (an isolated seed has a defined,
    * empty neighborhood — it just never expands). */
  def bfsDistances(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      sources: DataFrame,
      sourceCol: String,
      maxHops: Int
  ): DataFrame = {
    require(maxHops >= 1 && maxHops <= 30,
      s"maxHops must be in [1, 30], got $maxHops")
    val und = Triangles.canonicalEdges(edges, srcCol, dstCol)
    // bidirectional adjacency, stored partitioned+sorted on the probe
    // key: each round's frontier join then reuses the layout and only
    // the frontier side exchanges
    val adj = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
      .repartition(col("node"))
      .sortWithinPartitions("node")
      .localCheckpoint(true)
    var visited = sources.select(sources(sourceCol).as("node")).distinct()
      .withColumn("dist", lit(0))
      .localCheckpoint(true)
    var frontier = visited.select("node").localCheckpoint(true)
    var d = 0
    var exhausted = frontier.isEmpty
    while (!exhausted && d < maxHops) {
      d += 1
      val next = frontier.join(adj, Seq("node"))
        .select(col("nbr").as("node"))
        .distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(true)
      exhausted = next.isEmpty
      if (!exhausted) {
        val grown = visited
          .unionByName(next.withColumn("dist", lit(d)))
          .localCheckpoint(true)
        CheckpointBridge.release(visited)
        CheckpointBridge.release(frontier)
        visited = grown
        frontier = next
      } else {
        CheckpointBridge.release(next)
      }
    }
    CheckpointBridge.release(frontier)
    CheckpointBridge.release(adj)
    visited
  }

  /** Deterministic "random" walks — the DeepWalk / node2vec corpus
    * generator (Perozzi et al. 2014, public): `walksPerNode` walks of
    * `steps` steps from every node of the canonical undirected graph,
    * step t from node u following neighbor index
    * `md5(start|walk|t|u) mod deg(u)` over the rank-ordered adjacency.
    * The md5-derived choice replaces `rand()` deliberately (the
    * [[graft.operators.Shuffling]] rule): a task retry recomputes the
    * SAME walk, the result is partitioning-independent bit for bit,
    * and a fixed-step SQL unroll replays every transition — while
    * remaining uniform-ish over neighbors for the embedding-corpus use
    * (any 32-bit avalanche is indistinguishable from uniform at
    * realistic degrees).
    *
    * Output: `(start, walk_no, step, node)` — one row per visited
    * position, step 0 = the start itself. Walks never dead-end:
    * adjacency nodes have degree >= 1 by construction (isolated nodes
    * have no edges and start no walks).
    *
    * Scale shape: the ranked adjacency (`idx` within node, `deg`
    * carried on each row — both from ONE window pass over the same
    * (node, nbr) sort) is checkpointed once, partitioned+sorted on the
    * join key; each step is ONE equi-join of the one-row-per-walker
    * state against it (the neighbor-index predicate prunes the fanout
    * inside the joined task, nothing re-shuffles the adjacency). Step
    * states stay persisted until the final union materializes —
    * O(steps) bounded walker-id frames, released en bloc. The en-bloc
    * hold is INHERENT to returning the full corpus as one frame (each
    * step's output view shares its step's checkpoint blocks; an
    * earlier release would kill rows the result still needs), so the
    * live set is ~2x the output volume — measured at the API maximum
    * (walksPerNode=64, steps=20, 200k-node graph) to COMPLETE at the
    * 8 GB harness heap with the overflow riding the MEMORY_AND_DISK
    * checkpoint spill (SCALING.md r15 walk_stress). If even the
    * output won't fit one materialization, use [[randomWalksToSink]] —
    * identical rows, per-step parquet partitions, live set bounded
    * independent of `steps` (measured ~4x under union mode). Hub nodes
    * cost a degree-sized window partition once at build time; cap
    * hubs upstream (the [[LinkPrediction]] `maxDeg` argument) if the
    * graph has super-nodes. */
  def randomWalks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      walksPerNode: Int,
      steps: Int
  ): DataFrame = {
    require(walksPerNode >= 1 && walksPerNode <= 64,
      s"walksPerNode must be in [1, 64], got $walksPerNode")
    require(steps >= 1 && steps <= 20, s"steps must be in [1, 20], got $steps")
    val und = Triangles.canonicalEdges(edges, srcCol, dstCol)
    val sym = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
    // idx and deg ride the SAME sorted window partition -> one
    // WindowExec (the winnowed-fingerprints lesson)
    val byNode = Window.partitionBy("node").orderBy("nbr")
    val adj = sym
      .withColumn("idx", row_number().over(byNode) - 1)
      .withColumn("deg", count(lit(1)).over(
        byNode.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .repartition(col("node"))
      .sortWithinPartitions("node")
      .localCheckpoint(true)
    var state = adj.select("node").distinct()
      .select(col("node").as("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("walk_no"))
      .withColumn("cur", col("start"))
      .localCheckpoint(true)
    val states = scala.collection.mutable.ArrayBuffer(state)
    val outs = scala.collection.mutable.ArrayBuffer(
      state.select(col("start"), col("walk_no"),
        lit(0).as("step"), col("cur").as("node")))
    for (t <- 1 to steps) {
      val pick = pmod(
        conv(substring(md5(concat_ws("|",
          col("start").cast("string"), col("walk_no").cast("string"),
          lit(t).cast("string"), col("cur").cast("string"))), 1, 8), 16, 10)
          .cast("long"),
        col("deg"))
      val next = state.join(adj,
          state("cur") === adj("node") && adj("idx") === pick)
        .select(col("start"), col("walk_no"), col("nbr").as("cur"))
        .localCheckpoint(true)
      states += next
      state = next
      outs += state.select(col("start"), col("walk_no"),
        lit(t).as("step"), col("cur").as("node"))
    }
    val all = outs.reduce(_ unionByName _).localCheckpoint(true)
    states.foreach(CheckpointBridge.release)
    CheckpointBridge.release(adj)
    all
  }

  /** [[randomWalks]] with a per-step PARTITIONED SINK — the escape
    * hatch for walk corpora that cannot materialize as one frame. The
    * one-frame contract forces an en-bloc hold of every step's
    * checkpoint until the final union lands (~2x the output volume
    * live, measured riding ~21 GB of MEMORY_AND_DISK spill at the API
    * maximum — SCALING.md r15 walk_stress); here each step's rows are
    * WRITTEN to `path` as parquet partition `step=t` the moment they
    * exist, after which only the one-row-per-walker CURRENT state
    * survives to drive step t+1 — the previous step's checkpoint is
    * released immediately (the [[bfsDistances]] O(1)-persisted-copies
    * discipline). Live set: the ranked adjacency + two walker-state
    * frames, INDEPENDENT of `steps`; the corpus accumulates on disk,
    * partition-pruned for the downstream per-step readers
    * ([[walkSkipgramPairs]] reads `step IN [t-w, t+w]`, never the full
    * corpus).
    *
    * Rows are IDENTICAL to [[randomWalks]]'s (same md5 transitions,
    * same `(start, walk_no, step, node)` schema — spec-gated); only
    * the delivery changes. Each step is one append job writing one
    * `step=t` directory, so a resume-after-failure can truncate to the
    * last complete partition. Returns the read-back DataFrame (schema
    * normalized: partition-column `step` cast back to int, column
    * order restored). */
  def randomWalksToSink(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      walksPerNode: Int,
      steps: Int,
      path: String
  ): DataFrame = {
    require(walksPerNode >= 1 && walksPerNode <= 64,
      s"walksPerNode must be in [1, 64], got $walksPerNode")
    require(steps >= 1 && steps <= 20, s"steps must be in [1, 20], got $steps")
    val spark = edges.sparkSession
    val und = Triangles.canonicalEdges(edges, srcCol, dstCol)
    val sym = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
    val byNode = Window.partitionBy("node").orderBy("nbr")
    val adj = sym
      .withColumn("idx", row_number().over(byNode) - 1)
      .withColumn("deg", count(lit(1)).over(
        byNode.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .repartition(col("node"))
      .sortWithinPartitions("node")
      .localCheckpoint(true)
    var state = adj.select("node").distinct()
      .select(col("node").as("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("walk_no"))
      .withColumn("cur", col("start"))
      .localCheckpoint(true)
    def emit(s: DataFrame, t: Int, mode: String): Unit =
      s.select(col("start"), col("walk_no"), col("cur").as("node"),
          lit(t).as("step"))
        .write.partitionBy("step").mode(mode).parquet(path)
    // The step-0 overwrite clears the whole sink only under STATIC
    // partition-overwrite semantics; if the session runs
    // partitionOverwriteMode=dynamic it would clear only step=0, and
    // stale step>=1 partitions from a prior run at this path would
    // survive into the appends — the read-back would silently mix old
    // and new rows. Clear the sink explicitly, independent of config.
    val sinkPath = new org.apache.hadoop.fs.Path(path)
    val fs = sinkPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(sinkPath)) fs.delete(sinkPath, true)
    emit(state, 0, "overwrite")
    for (t <- 1 to steps) {
      val pick = pmod(
        conv(substring(md5(concat_ws("|",
          col("start").cast("string"), col("walk_no").cast("string"),
          lit(t).cast("string"), col("cur").cast("string"))), 1, 8), 16, 10)
          .cast("long"),
        col("deg"))
      val next = state.join(adj,
          state("cur") === adj("node") && adj("idx") === pick)
        .select(col("start"), col("walk_no"), col("nbr").as("cur"))
        .localCheckpoint(true)
      // step t is durable on disk before the only other live copy of
      // its lineage goes away — nothing downstream re-reads state t-1
      emit(next, t, "append")
      CheckpointBridge.release(state)
      state = next
    }
    CheckpointBridge.release(state)
    CheckpointBridge.release(adj)
    spark.read.parquet(path)
      .select(col("start"), col("walk_no"), col("step").cast("int").as("step"),
        col("node"))
  }

  /** Skip-gram pair generation over a [[randomWalksToSink]] corpus —
    * the consumer that sink's per-step partitioning exists for
    * (word2vec-style training pairs from walk windows, Perozzi et al.
    * 2014 §4.2; Mikolov et al. 2013, both public): for every walk
    * position with `step` in `[centerLo, centerHi]`, one pair per
    * other position of the SAME walk within `window` steps, rolled up
    * to `(center, context, n_pairs)` counts.
    *
    * Delivery contract: reads ONLY parquet partitions
    * `step BETWEEN centerLo - window AND centerHi + window` — the scan
    * carries a PartitionFilters entry (machine-gated, PlanAuditSpec),
    * so a consumer pairing one freshly-written step `t` of a live walk
    * corpus touches `2·window + 1` step directories, never the full
    * corpus. Pass the full step range to pair everything.
    *
    * Scale shape: one read of the pruned slice, one equi-join keyed by
    * walker `(start, walk_no)` with the step-distance predicate inside
    * the joined task (per-walker groups are ≤ steps+1 rows a side — no
    * skew possible), then a map-side-combined count rollup keyed by the
    * pair. Nothing is ever keyed by node alone, so hub nodes cost
    * their pair multiplicity in the final aggregate only. */
  def walkSkipgramPairs(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      window: Int,
      centerLo: Int,
      centerHi: Int
  ): DataFrame = {
    require(window >= 1 && window <= 10, s"window must be in [1, 10], got $window")
    require(centerLo >= 0 && centerHi >= centerLo,
      s"need 0 <= centerLo <= centerHi, got [$centerLo, $centerHi]")
    val slice = spark.read.parquet(path)
      .where(col("step").between(centerLo - window, centerHi + window))
      .select(col("start"), col("walk_no"),
        col("step").cast("int").as("step"), col("node"))
    val centers = slice.where(col("step").between(centerLo, centerHi))
      .select(col("start"), col("walk_no"),
        col("step").as("cstep"), col("node").as("center"))
    val contexts = slice.select(col("start"), col("walk_no"),
      col("step").as("xstep"), col("node").as("context"))
    centers.join(contexts, Seq("start", "walk_no"))
      .where(col("xstep") =!= col("cstep") &&
        abs(col("xstep") - col("cstep")) <= window)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Node embeddings from skip-gram co-occurrence counts — the walk
    * pipeline's closer: [[randomWalks]]/[[randomWalksToSink]] →
    * [[walkSkipgramPairs]] → THIS → the whole embedding machinery
    * ([[Similarity]] kNN graphs, communities, ANN indexes) now runs on
    * a graph that never had embeddings. Public methodology: Levy &
    * Goldberg 2014 (skip-gram factorizes the PPMI matrix) + the
    * Johnson–Lindenstrauss random projection that replaces the SGD
    * factorization with a closed form — each node's embedding is its
    * sparse PPMI context row projected through a deterministic md5
    * random matrix, so the output is REPLAYABLE (no SGD, no seed
    * state, no iteration order).
    *
    * Exactness contract (the [[PageRank]] integer rule): PPMI is
    * quantized once per (center, context) cell to
    * `max(0, floor(ln(n·N / (nc·nx)) · 1e9))` nano-nats, each projected
    * term is quantized once to micro-units
    * (`floor((ppmi_q/1e9) · w(context, j) · 1e6)` with
    * `w = md5(context_j) / 2^59 − 1 ∈ [−1, 1)`), and the embedding
    * component is the exact integer sum of those micro-terms — one
    * closed-form double per output row, partitioning-independent bit
    * for bit. Returns LONG FORM `(node, j, weight)`, `dim` rows per
    * node with any positive-PPMI context; assemble arrays downstream
    * when feeding cosine machinery.
    *
    * Scale shape: the pairs table is checkpointed once and read for
    * three bounded aggregates (grand total, per-center totals,
    * per-context totals) plus the main pass; the projection explodes
    * each positive-PPMI cell `dim` ways into ONE map-side-combined
    * `(center, j)` aggregate — cost is `nnz(PPMI) · dim` rows through
    * a combiner, never a collected matrix. Keep `dim` in the tens
    * (16–64): JL distortion falls as 1/sqrt(dim) while the explode
    * cost grows linearly. */
  def skipgramNodeEmbeddings(pairs: DataFrame, dim: Int = 32): DataFrame = {
    require(dim >= 2 && dim <= 256,
      s"dim must be in [2, 256] (explode fan-out is nnz * dim), got $dim")
    val dec = "decimal(38,0)"
    val p = pairs.select(col("center"), col("context"),
      col("n_pairs").cast("long").as("__n"))
      .localCheckpoint(true) // read twice: grand total + the main pass
    // the grand pair total is ONE exact long — a driver scalar (the
    // PageRank dangling-floor rule), not a corpus-sized artifact
    val grandN: Long = {
      val r = p.agg(sum(col("__n").cast(dec)).cast("long")).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0) // empty pairs -> empty output
    }
    // per-center / per-context totals as PARTITIONED windows (keyed
    // exchanges, skew bounded by a node's pair multiplicity — never a
    // global window), sidestepping a three-way self-join of the
    // checkpointed frame
    val wC = Window.partitionBy("center")
    val wX = Window.partitionBy("context")
    val ppmi = p
      .withColumn("__nc", sum(col("__n").cast(dec)).over(wC).cast("long"))
      .withColumn("__nx", sum(col("__n").cast(dec)).over(wX).cast("long"))
      .select(col("center"), col("context"),
        greatest(lit(0L),
          floor(log((col("__n").cast("double") * lit(grandN))
              / (col("__nc").cast("double") * col("__nx"))) * lit(1e9))
            .cast("long")).as("__ppmi_q"))
      .where(col("__ppmi_q") > 0)
    ppmi
      .select(col("center"), col("__ppmi_q"), col("context"),
        explode(sequence(lit(0), lit(dim - 1))).as("j"))
      .select(col("center"), col("j"),
        floor(((col("__ppmi_q").cast("double") / lit(1e9))
            * (Dedup.md5TokenHash60(
                concat(col("context").cast("string"), lit("_"), col("j").cast("string")))
                  .cast("double") / lit(576460752303423488.0) - lit(1.0)))
            * lit(1e6))
          .cast("long").as("__tq"))
      .groupBy(col("center"), col("j"))
      .agg(sum(col("__tq").cast(dec)).cast("long").as("__sq"))
      .select(col("center").as("node"), col("j").cast("long").as("j"),
        (col("__sq").cast("double") / lit(1e6)).as("weight"))
  }

  /** BIASED (node2vec) walks — [[randomWalks]] with the Grover &
    * Leskovec 2016 (public) 2nd-order transition: from `cur` with
    * previous node `prev`, each neighbor `x` of `cur` weighs
    *   - `wReturn`  when `x = prev`              (the paper's 1/p),
    *   - `wCommon`  when `x` is adjacent to `prev` (the paper's 1),
    *   - `wOut`     otherwise                     (the paper's 1/q),
    * and the walker picks the neighbor whose cumulative-weight interval
    * (over the rank-ordered adjacency) contains
    * `md5(start|walk|t|cur) mod totalWeight`. INTEGER weights replace
    * the paper's 1/p, 1, 1/q on purpose: scale all three by a common
    * denominator (p=0.5, q=2 → wReturn=4, wCommon=2, wOut=1) and the
    * pick is exact integer arithmetic a DuckDB twin replays bit for
    * bit — same determinism contract as [[randomWalks]] (retry-stable,
    * partitioning-independent; with wReturn=wCommon=wOut the interval
    * pick degenerates to the uniform walk's index pick over a
    * constant-width grid, though the md5 draw is taken mod
    * `w·deg` rather than `deg`, so the two functions' corpora are not
    * row-identical — by design, each is its own replayable contract).
    * Step 1 has no `prev` and is uniform over neighbors, exactly
    * [[randomWalks]]'s pick (the paper's convention).
    *
    * Scale shape: the second-order pick NEEDS the candidate fan-out
    * (deg(cur) rows per walker per step — inherent to node2vec; the
    * uniform walk's index-predicate join cannot express
    * prev-dependent weights), plus one broadcast-free equi-join of the
    * candidates against the canonical edge set to classify
    * `x adjacent to prev` (keyed by the canonical pair, never by
    * node), and one per-walker window pass for the cumulative
    * interval. Per-step cost is O(sum of deg over walker positions) —
    * cap super-node degree upstream (the [[LinkPrediction]] `maxDeg`
    * pattern) if the graph has hubs. State and adjacency checkpoints
    * follow [[randomWalks]]'s O(steps)-bounded union-mode discipline;
    * use [[randomWalksBiasedToSink]] for corpora that cannot
    * materialize as one frame. */
  def randomWalksBiased(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      walksPerNode: Int,
      steps: Int,
      wReturn: Int,
      wCommon: Int,
      wOut: Int
  ): DataFrame = {
    val outs = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val last = biasedWalkCore(edges, srcCol, dstCol, walksPerNode, steps,
      wReturn, wCommon, wOut) { (stepDf, t) =>
      outs += stepDf.select(col("start"), col("walk_no"),
        lit(t).as("step"), col("cur").as("node"))
    }
    val all = outs.reduce(_ unionByName _).localCheckpoint(true)
    last.foreach(CheckpointBridge.release)
    all
  }

  /** [[randomWalksBiased]] with the [[randomWalksToSink]] per-step
    * partitioned-sink delivery: identical rows (same md5 interval
    * picks), live set bounded independent of `steps`, stale sink
    * contents cleared up front, read-back returned with the partition
    * column normalized. [[walkSkipgramPairs]] consumes the result the
    * same way. */
  def randomWalksBiasedToSink(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      walksPerNode: Int,
      steps: Int,
      wReturn: Int,
      wCommon: Int,
      wOut: Int,
      path: String
  ): DataFrame = {
    val spark = edges.sparkSession
    val sinkPath = new org.apache.hadoop.fs.Path(path)
    val fs = sinkPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(sinkPath)) fs.delete(sinkPath, true)
    var prevState: Option[DataFrame] = None
    val last = biasedWalkCore(edges, srcCol, dstCol, walksPerNode, steps,
      wReturn, wCommon, wOut) { (stepDf, t) =>
      stepDf.select(col("start"), col("walk_no"), col("cur").as("node"),
          lit(t).as("step"))
        .write.partitionBy("step")
        .mode(if (t == 0) "overwrite" else "append").parquet(path)
      // step t is durable before its predecessor's only live copy goes
      prevState.foreach(CheckpointBridge.release)
      prevState = Some(stepDf)
    }
    // every step state was already released as it was superseded (the
    // bounded-live-set contract); re-releasing is a no-op, so one sweep
    // frees the final state plus the adjacency/edge checkpoints
    last.foreach(CheckpointBridge.release)
    spark.read.parquet(path)
      .select(col("start"), col("walk_no"), col("step").cast("int").as("step"),
        col("node"))
  }

  /** Shared biased-walk engine: runs the step loop, hands each step's
    * walker state `(start, walk_no, prev, cur)` to `emit` the moment it
    * is checkpointed, and returns the frames still persisted (adjacency,
    * canonical edges, and — in union mode — every step's state; the
    * caller releases them once its delivery materialized). */
  private def biasedWalkCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      walksPerNode: Int,
      steps: Int,
      wReturn: Int,
      wCommon: Int,
      wOut: Int
  )(emit: (DataFrame, Int) => Unit): Seq[DataFrame] = {
    require(walksPerNode >= 1 && walksPerNode <= 64,
      s"walksPerNode must be in [1, 64], got $walksPerNode")
    require(steps >= 1 && steps <= 20, s"steps must be in [1, 20], got $steps")
    Seq("wReturn" -> wReturn, "wCommon" -> wCommon, "wOut" -> wOut).foreach {
      case (n, w) => require(w >= 1 && w <= 1000,
        s"$n must be in [1, 1000] (integer weights; 0 would dead-end " +
          s"single-neighbor walkers), got $w")
    }
    val und = Triangles.canonicalEdges(edges, srcCol, dstCol)
      .localCheckpoint(true)
    val sym = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
    val byNode = Window.partitionBy("node").orderBy("nbr")
    val adj = sym
      .withColumn("idx", row_number().over(byNode) - 1)
      .withColumn("deg", count(lit(1)).over(
        byNode.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .repartition(col("node"))
      .sortWithinPartitions("node")
      .localCheckpoint(true)
    def draw(t: Int): Column = conv(substring(md5(concat_ws("|",
      col("start").cast("string"), col("walk_no").cast("string"),
      lit(t).cast("string"), col("cur").cast("string"))), 1, 8), 16, 10)
      .cast("long")
    var state = adj.select("node").distinct()
      .select(col("node").as("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("walk_no"))
      .withColumn("prev", col("start")) // placeholder; step 1 ignores it
      .withColumn("cur", col("start"))
      .localCheckpoint(true)
    val live = scala.collection.mutable.ArrayBuffer(state)
    emit(state, 0)
    for (t <- 1 to steps) {
      val next = (if (t == 1) {
        // no prev yet: uniform over neighbors, the randomWalks pick
        state.join(adj,
            state("cur") === adj("node") && adj("idx") === pmod(draw(1), col("deg")))
          .select(col("start"), col("walk_no"),
            col("cur").as("prev"), col("nbr").as("cur"))
      } else {
        val cand = state.join(adj, state("cur") === adj("node"))
          .join(und.select(col("a").as("__ea"), col("b").as("__eb")),
            least(col("prev"), col("nbr")) === col("__ea") &&
              greatest(col("prev"), col("nbr")) === col("__eb"), "left")
          .select(col("start"), col("walk_no"), col("prev"), col("cur"),
            col("nbr"), col("idx"),
            when(col("nbr") === col("prev"), lit(wReturn.toLong))
              .when(col("__ea").isNotNull, lit(wCommon.toLong))
              .otherwise(lit(wOut.toLong)).as("wt"))
        val byWalker = Window.partitionBy("start", "walk_no")
        val cum = cand
          .withColumn("cw", sum("wt").over(byWalker.orderBy("idx")))
          .withColumn("tw", max(col("cw")).over(byWalker.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        val r = pmod(draw(t), col("tw"))
        cum.where(col("cw") - col("wt") <= r && r < col("cw"))
          .select(col("start"), col("walk_no"),
            col("cur").as("prev"), col("nbr").as("cur"))
      }).localCheckpoint(true)
      live += next
      state = next
      emit(state, t)
    }
    live.toSeq :+ adj :+ und
  }
}
