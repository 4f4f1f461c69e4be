package graft.tree

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Memory-efficient decision-tree classifier, trained entirely as
  * DataFrame dataflow — the Spark-native rebuild of the reference's
  * Polars-backed `DecisionTreeClassifier` (reference: efficient_trees/tree.py:16-385).
  *
  * Execution shape per tree node: ONE Spark job
  * ([[SplitSearch.searchWithStats]]) that returns every feature's best
  * split AND the node's class distribution; the children's distributions
  * fall out of the winner's cumulative counts, so leaves cost zero jobs.
  * The reference runs ~3 executions per node (per-feature `collect_all`
  * fan-out + mask collect + distribution collect, tree.py:339-372).
  *
  * @param maxDepth       depth cap; at `depth >= maxDepth` a majority-class
  *                       leaf is emitted (reference: tree.py:202-203)
  * @param categoricalColumns columns to ordinal-target-encode before
  *                       training (reference: tree.py:93-108)
  * @param shrinkDtype    mirror the reference's `shrink_dtype()` projection
  *                       (tree.py:90): double feature columns pass through
  *                       Float32 during FIT, so learned thresholds sit on
  *                       the f32 grid (e.g. 1.9 -> 1.8999999761581421).
  *                       Prediction runs on the caller's unshrunk frame —
  *                       exactly like the reference, where a full-precision
  *                       1.9 then lands in the RIGHT branch of that
  *                       threshold. The reference's golden iris lists
  *                       depend on this (IrisGoldenSpec); integer-typed
  *                       columns are value-preserving under the
  *                       reference's shrink, so only doubles are touched,
  *                       and (like Polars) only when the column's values
  *                       fit f32 range — out-of-range features stay f64
  *                       instead of collapsing to Infinity.
  * @param criterion      entropy or gini (reference: enums.py:8-14)
  * @param maxBins        when set, candidate thresholds per feature are
  *                       restricted to `maxBins` approximate quantile edges
  *                       computed ONCE on the training data (MLlib-style).
  *                       This bounds the per-feature cumulative-count window
  *                       partition at maxBins+1 rows — the scale-safe mode
  *                       for continuous features, where exact mode's
  *                       candidate set (every distinct value) would put O(n)
  *                       rows in a single window task. Counts at the chosen
  *                       edges stay exact; only the candidate set shrinks.
  *                       None = exact mode (reference parity, golden tests).
  * @param exactCumulativePartitions exact mode's other scale lever: when
  *                       set, the cumulative class counts use the
  *                       declarative bucketed prefix sum
  *                       ([[SplitSearch.cumulativeCountsPartitioned]])
  *                       instead of one window task per feature — same
  *                       results, bounded window partitions, still one
  *                       query per level (two tiny broadcast side
  *                       aggregates, no checkpoint). Ignored when maxBins
  *                       already bounds the windows.
  * @param useAggregatedHistogram binned mode's fast path (default on): the
  *                       single-pass [[graft.functions.MultiFeatureHistogram]]
  *                       aggregate replaces the melt + window pipeline —
  *                       no (#features+1)x row explosion, one tiny-row
  *                       merge instead of a histogram shuffle, gain math
  *                       on the driver. Same splits; stored gain metadata
  *                       can differ in the last ulp vs the pipeline path.
  * @param cacheNodes     persist each node's rows (MEMORY_AND_DISK) for the
  *                       duration of its subtree build. The reference's
  *                       lazy/streaming mode re-derives every node from the
  *                       root scan through the stacked filters instead
  *                       (tree.py:233-234, SURVEY.md §3 EP1) — set false to
  *                       reproduce that recompute-everything behavior (lower
  *                       memory, more scans). On a cluster, cached node data
  *                       spills to executor-local disk, so this is the
  *                       out-of-core analogue of the reference's streaming
  *                       engine, with strictly fewer input rescans.
  * @param checkpointDepthInterval every this-many levels, truncate plan
  *                       lineage with `localCheckpoint` — stacked filters
  *                       grow the logical plan linearly with depth and
  *                       Catalyst analysis cost superlinearly
  *                       (SURVEY.md §7 hard-part 2). 0 disables.
  */
final case class DecisionTreeClassifier(
    maxDepth: Option[Int] = None,
    categoricalColumns: Seq[String] = Nil,
    shrinkDtype: Boolean = true,
    criterion: Criterion = Criterion.Entropy,
    maxBins: Option[Int] = None,
    exactCumulativePartitions: Option[Int] = None,
    useAggregatedHistogram: Boolean = true,
    levelWise: Boolean = true,
    cacheNodes: Boolean = true,
    checkpointDepthInterval: Int = 0
) {

  /** Level-wise construction state: the partially built tree, where
    * [[BPending]] marks nodes whose split is still to be decided. Pending
    * ids are (re)assigned every level in pre-order, matching the order the
    * nodeId expression emits them. */
  private sealed trait Building
  private final case class BSplit(feature: String, threshold: Double, gain: Double,
      crit: Double, dist: Seq[Long], left: Building, right: Building) extends Building
  private final case class BLeaf(value: Any) extends Building
  private final case class BPending(inherited: Option[Seq[Long]]) extends Building

  /** Train. Pipeline mirrors the reference's `fit` (tree.py:79-115):
    * schema introspection -> (dtype shrink: a no-op under Tungsten) ->
    * target-encode categoricals -> collect distinct targets ->
    * (maxBins mode: one approxQuantile pass for bin edges) ->
    * recursive build.
    */
  def fit(data: DataFrame, targetName: String): DecisionTreeModel = {
    val featureNames = data.schema.fieldNames.filterNot(_ == targetName).toSeq
    val targetType = data.schema(targetName).dataType

    // NULL targets are excluded up front: `=== lit(null)` never matches, so
    // a null class could never accrue histogram counts — the pipeline path
    // would still count those rows in count_examples while the aggregated
    // path dropped them (different trees per useAggregatedHistogram), and an
    // all-null node would throw "majority of empty node". One filter makes
    // every path see identical data. (The reference never defines null-target
    // behavior; its examples fill_null before fit — amex_default.py:23.)
    val nonNullTarget = data.where(col(targetName).isNotNull)

    val (encoded0, mappings) =
      if (categoricalColumns.nonEmpty) {
        val m = TargetEncoder.fitMappings(nonNullTarget, categoricalColumns, targetName)
        (TargetEncoder.applyMappings(nonNullTarget, m), m)
      } else (nonNullTarget, Map.empty[String, Map[String, Int]])

    // shrink_dtype parity (tree.py:90): double features lose to f32 grid
    // during fit only. Like Polars, shrink is a COLUMN-level decision
    // gated on the values fitting f32 range — a feature with magnitudes
    // beyond Float.MaxValue stays f64 rather than collapsing to Infinity.
    // Encoded categoricals are small ints — untouched.
    val doubleFeatures = featureNames.filter(f =>
      encoded0.schema(f).dataType == org.apache.spark.sql.types.DoubleType)
    def shrinkWith(absMax: String => Option[Double]): DataFrame =
      if (shrinkDtype && doubleFeatures.nonEmpty) {
        // one select, not a withColumn fold — each withColumn re-analyzes
        // the accumulated plan, O(width^2) driver time at 190 features
        // (the same hazard WidePhaseProbe measured in the bench harness)
        val shrinkSet = doubleFeatures.filter(f =>
          // absent = all-null/all-NaN feature: the cast is a no-op either way
          absMax(f).forall(_ <= Float.MaxValue.toDouble)).toSet
        encoded0.select(encoded0.columns.map { c =>
          if (shrinkSet(c)) col(c).cast("float").cast("double").as(c) else col(c)
        }: _*)
      } else encoded0

    // maxBins mode: per-feature quantile edges, computed once on the root
    // data and reused for every node (MLlib-style binning). One
    // MultiQuantileSketch aggregate over a packed array projection — the
    // same Greenwald-Khanna summaries and 1/(4b) error contract as
    // `df.stat.approxQuantile`, without its per-row Row conversion that
    // re-boxes every feature (at 190 features that conversion was ~90% of
    // the whole binned fit). The SAME pass also answers the shrink
    // decision: GK summaries retain the exact extremes, so querying
    // probabilities 0 and 1 yields each feature's exact min/max and the
    // f32-fit gate costs no second corpus scan (exact mode keeps its
    // dedicated max(abs) aggregate). Edges are therefore computed on the
    // PRE-shrink doubles — still valid cut points for the f32-shrunk
    // training values (counts AT the chosen edges stay exact; only the
    // candidate grid shifts within the sketch's error bound). NaN is
    // ignored throughout: a NaN never blocks shrink (NaN survives the
    // f32 cast value-preserved), unlike a max(abs) aggregate where NaN
    // would poison the comparison.
    val (encoded: DataFrame, binEdges: Map[String, Seq[Double]]) = maxBins match {
      case Some(b) =>
        require(b >= 2, s"maxBins must be >= 2, got $b")
        import org.apache.spark.sql.graft.ColumnBridge
        val probs = 0.0 +: (1 until b).map(_.toDouble / b) :+ 1.0
        val packed = array(featureNames.map(f => col(f).cast("double")): _*)
        val agg = graft.functions.MultiQuantileSketch(
          ColumnBridge.expression(col("__arr")), featureNames.size, 1.0 / (4 * b), probs)
        // Pre-project the packed array through whole-stage codegen (r21):
        // an imperative aggregate evaluates its child expressions with
        // interpreted eval per row, so the bare CreateArray boxed every
        // feature of every row (at 190 features the boxing dominated the
        // pass and its garbage drove the 32-core page-churn pathology the
        // r20 scaling block exposed). A bound attribute read is free.
        val quantiles: Seq[Seq[Double]] = encoded0
          .select(packed.as("__arr"))
          .select(ColumnBridge.column(agg.toAggregateExpression()).as("qs"))
          .head().getSeq[scala.collection.Seq[Double]](0).map(_.toSeq)
        val absMax: Map[String, Double] = featureNames.zip(quantiles).collect {
          case (f, qs) if qs.nonEmpty =>
            f -> math.max(math.abs(qs.head), math.abs(qs.last))
        }.toMap
        val edges = featureNames
          .zip(quantiles.map(qs =>
            if (qs.isEmpty) qs else qs.drop(1).dropRight(1).distinct.sorted))
          .filter(_._2.nonEmpty).toMap
        (shrinkWith(absMax.get), edges)
      case None =>
        val maxAbs: Map[String, Double] =
          if (shrinkDtype && doubleFeatures.nonEmpty) {
            val aggs = doubleFeatures.map(f => max(abs(col(f))).as(s"__ma_$f"))
            val r = encoded0.agg(aggs.head, aggs.tail: _*).head()
            doubleFeatures.flatMap { f =>
              Option(r.getAs[Any](s"__ma_$f")).map { case m: Double => f -> m }
            }.toMap
          } else Map.empty
        (shrinkWith(maxAbs.get), Map.empty[String, Seq[Double]])
    }

    // Distinct target values (tree.py:110-113). The reference's order is
    // engine-arbitrary; we sort for deterministic class indexing.
    val targets: Seq[Any] =
      encoded.select(col(targetName)).distinct().orderBy(col(targetName)).collect().map(_.get(0)).toSeq

    // Exact+partitioned mode: per-feature (min, max) computed ONCE here give
    // every level's bucketed prefix sum a literal bucket expression (no
    // in-plan ranges aggregate). Root-data ranges over-cover deeper nodes'
    // value slices — fewer effective buckets, never wrong answers.
    val cumRanges: Map[String, (Double, Double)] =
      if (binEdges.isEmpty && exactCumulativePartitions.isDefined) {
        val aggs = featureNames.flatMap { f =>
          val c = col(f).cast("double")
          Seq(min(when(!isnan(c), c)).as(s"__mn_$f"), max(when(!isnan(c), c)).as(s"__mx_$f"))
        }
        val r = encoded.agg(aggs.head, aggs.tail: _*).head()
        featureNames.flatMap { f =>
          (Option(r.getAs[Any](s"__mn_$f")), Option(r.getAs[Any](s"__mx_$f"))) match {
            case (Some(mn: Double), Some(mx: Double)) => Some(f -> (mn, mx))
            case _                                    => None // all-null/NaN feature
          }
        }.toMap
      } else Map.empty

    val tree =
      if (levelWise)
        buildTreeLevelWise(encoded, featureNames, targetName, targets, binEdges, cumRanges)
      else
        buildTree(encoded, featureNames, targetName, targets, binEdges, cumRanges,
          depth = 0, inheritedDist = None)
    DecisionTreeModel(tree, mappings, targetType)
  }

  // ---- level-wise construction (one Spark job per tree LEVEL) -------------

  /** Breadth-first trainer: each level runs ONE job
    * ([[SplitSearch.searchLevelWithStats]], or the
    * [[SplitSearch.searchLevelAggregated]] single-pass aggregate in binned
    * mode) that answers every pending node at once — rows are routed to
    * their pending node by a when-chain id expression over the partial
    * tree. Jobs per tree = depth, not node count; the source is cached
    * once instead of per node. Identical trees to the depth-first builder
    * (node membership and per-node math are the same; asserted in
    * SplitSearchSpec). The id when-chain has one branch per node at the
    * current frontier, so keep depth <= ~12 (the reference's own examples
    * cap at 4-8).
    */
  private def buildTreeLevelWise(
      data: DataFrame,
      featureNames: Seq[String],
      targetName: String,
      targets: Seq[Any],
      binEdges: Map[String, Seq[Double]],
      cumRanges: Map[String, (Double, Double)]
  ): TreeNode = {
    val source = if (cacheNodes) data.persist(StorageLevel.MEMORY_AND_DISK) else data

    def countPendings(b: Building): Int = b match {
      case s: BSplit   => countPendings(s.left) + countPendings(s.right)
      case _: BLeaf    => 0
      case _: BPending => 1
    }

    /** Pre-order pending-node id routing expression over the partial tree.
      * NULL id = row sits in a finalized leaf or drops out at a NULL split
      * feature (3-valued logic — same as the recursive builder's filters). */
    def idExpr(b: Building): org.apache.spark.sql.Column = {
      var idx = -1
      def walk(n: Building): org.apache.spark.sql.Column = n match {
        case _: BLeaf => lit(null).cast("int")
        case _: BPending =>
          idx += 1; lit(idx).cast("int")
        case s: BSplit =>
          val c = col(s.feature).cast("double")
          val lc = walk(s.left)
          val rc = walk(s.right)
          when(c <= lit(s.threshold), lc).when(c > lit(s.threshold), rc)
            .otherwise(lit(null).cast("int"))
      }
      walk(b)
    }

    def finalizeAtDepthCap(b: Building, isRoot: Boolean = false): Building = b match {
      case s: BSplit => s.copy(left = finalizeAtDepthCap(s.left), right = finalizeAtDepthCap(s.right))
      case l: BLeaf  => l
      case BPending(inherited) =>
        // Only the root can legitimately lack an inherited distribution
        // (maxDepth = 0: no level job ever ran). Every deeper pending node
        // was created alongside its distribution; falling back to a
        // distributionJob over the ROOT source there would silently
        // compute the wrong majority — make the invariant loud instead.
        val dist = inherited.getOrElse {
          if (isRoot) distributionJob(source, targetName, targets)
          else throw new IllegalStateException(
            "pending node below the root hit the depth cap without an inherited distribution")
        }
        BLeaf(majorityFromDist(dist, targets))
    }

    def toTree(b: Building): TreeNode = b match {
      case BSplit(f, t, g, c, d, l, r) => SplitNode(f, t, g, c, d, toTree(l), toTree(r))
      case BLeaf(v)                    => LeafNode(v)
      case _: BPending =>
        throw new IllegalStateException("pending node survived construction")
    }

    try {
      var tree: Building = BPending(None)
      var depth = 0
      while (countPendings(tree) > 0) {
        if (maxDepth.exists(depth >= _)) {
          tree = finalizeAtDepthCap(tree, isRoot = depth == 0)
        } else {
          val numPendings = countPendings(tree)
          val nodeId = idExpr(tree)
          val results: Map[Int, SplitSearch.NodeSearch] =
            if (binEdges.nonEmpty && useAggregatedHistogram)
              SplitSearch.searchLevelAggregated(source, nodeId, numPendings,
                featureNames, targetName, targets, criterion, binEdges)
            else
              SplitSearch.searchLevelWithStats(source, nodeId,
                featureNames, targetName, targets, criterion, binEdges,
                if (binEdges.isEmpty) exactCumulativePartitions else None, cumRanges)
          var idx = -1
          def rebuild(b: Building): Building = b match {
            case s: BSplit => s.copy(left = rebuild(s.left), right = rebuild(s.right))
            case l: BLeaf  => l
            case BPending(inherited) =>
              idx += 1
              results.get(idx) match {
                case Some(search) =>
                  search.best match {
                    case Some(cs) if cs.candidate.informationGain > 0 =>
                      val c = cs.candidate
                      val leftDist = cs.leftClassCounts
                      val rightDist = cs.featureClassTotals.zip(cs.leftClassCounts)
                        .map { case (t, l) => t - l }
                      BSplit(c.feature, c.threshold, c.informationGain, c.parentCriterion,
                        search.nodeDistribution,
                        BPending(Some(leftDist)), BPending(Some(rightDist)))
                    case _ =>
                      BLeaf(majorityFromDist(search.nodeDistribution, targets))
                  }
                case None =>
                  // node received no rows — only reachable through an
                  // inherited distribution, which then decides the leaf
                  BLeaf(majorityFromDist(
                    inherited.getOrElse(throw new IllegalStateException(
                      s"pending node $idx has neither rows nor an inherited distribution")),
                    targets))
              }
          }
          tree = rebuild(tree)
          depth += 1
        }
      }
      toTree(tree)
    } finally {
      if (cacheNodes) source.unpersist(blocking = false)
    }
  }

  /** Majority label from a class-count vector aligned to the (sorted)
    * `targets`: argmax count, smallest label on ties (the reference takes
    * an arbitrary row on ties — documented divergence, SURVEY.md §2.11). */
  private def majorityFromDist(dist: Seq[Long], targets: Seq[Any]): Any = {
    require(dist.exists(_ > 0), "majority of empty node")
    targets(dist.indexOf(dist.max))
  }

  /** Fallback single job for the rare no-inherited-distribution case
    * (depth cap at the root). */
  private def distributionJob(df: DataFrame, targetName: String, targets: Seq[Any]): Seq[Long] = {
    val counts = df.groupBy(col(targetName)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getAs[Long]("n")).toMap
    targets.map(t => counts.getOrElse(t, 0L))
  }

  /** Recursive node build (reference: tree.py:180-385). */
  private def buildTree(
      data: DataFrame,
      featureNames: Seq[String],
      targetName: String,
      targets: Seq[Any],
      binEdges: Map[String, Seq[Double]],
      cumRanges: Map[String, (Double, Double)],
      depth: Int,
      inheritedDist: Option[Seq[Long]]
  ): TreeNode = {
    if (maxDepth.exists(depth >= _)) {
      // Depth-capped leaf: zero Spark jobs when the parent handed us the
      // distribution (always, except a root-level cap).
      val dist = inheritedDist.getOrElse(distributionJob(data, targetName, targets))
      return LeafNode(majorityFromDist(dist, targets))
    }

    val node = {
      val checkpointed =
        if (checkpointDepthInterval > 0 && depth > 0 && depth % checkpointDepthInterval == 0)
          data.localCheckpoint(eager = false)
        else data
      if (cacheNodes) checkpointed.persist(StorageLevel.MEMORY_AND_DISK) else checkpointed
    }
    try {
      // Binned mode takes the single-pass aggregate fast path (no melt,
      // driver-side gain math); exact mode runs the DataFrame pipeline.
      val search =
        if (binEdges.nonEmpty && useAggregatedHistogram)
          SplitSearch.searchWithStatsAggregated(
            node, featureNames, targetName, targets, criterion, binEdges)
        else
          SplitSearch.searchWithStats(
            node, featureNames, targetName, targets, criterion, binEdges,
            if (binEdges.isEmpty) exactCumulativePartitions else None, cumRanges)
      search.best match {
        case Some(cs) if cs.candidate.informationGain > 0 =>
          val c = cs.candidate
          // Split by re-applying the predicate on each side — same 3-valued
          // semantics as the reference's materialized mask + ~mask
          // (tree.py:351-358): NULL-feature rows leave both children.
          val pred = col(c.feature).cast("double") <= lit(c.threshold)
          val leftDist = cs.leftClassCounts
          val rightDist = cs.featureClassTotals.zip(cs.leftClassCounts).map { case (t, l) => t - l }
          val left = buildTree(node.where(pred), featureNames, targetName, targets,
            binEdges, cumRanges, depth + 1, Some(leftDist))
          val right = buildTree(node.where(!pred), featureNames, targetName, targets,
            binEdges, cumRanges, depth + 1, Some(rightDist))
          SplitNode(c.feature, c.threshold, c.informationGain, c.parentCriterion,
            search.nodeDistribution, left, right)
        case _ =>
          LeafNode(majorityFromDist(search.nodeDistribution, targets))
      }
    } finally {
      if (cacheNodes) node.unpersist(blocking = false)
    }
  }
}
