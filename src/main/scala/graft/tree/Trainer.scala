package graft.tree

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Memory-efficient decision-tree classifier, trained entirely as
  * DataFrame dataflow — the Spark-native rebuild of the reference's
  * Polars-backed `DecisionTreeClassifier` (reference: efficient_trees/tree.py:16-385).
  *
  * @param maxDepth       depth cap; at `depth >= maxDepth` a majority-class
  *                       leaf is emitted (reference: tree.py:202-203)
  * @param categoricalColumns columns to ordinal-target-encode before
  *                       training (reference: tree.py:93-108)
  * @param criterion      entropy or gini (reference: enums.py:8-14)
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
    criterion: Criterion = Criterion.Entropy,
    cacheNodes: Boolean = true,
    checkpointDepthInterval: Int = 0
) {

  /** Train. Pipeline mirrors the reference's `fit` (tree.py:79-115):
    * schema introspection -> (dtype shrink: a no-op under Tungsten) ->
    * target-encode categoricals -> collect distinct targets ->
    * recursive build.
    */
  def fit(data: DataFrame, targetName: String): DecisionTreeModel = {
    val featureNames = data.schema.fieldNames.filterNot(_ == targetName).toSeq
    val targetType = data.schema(targetName).dataType

    val (encoded, mappings) =
      if (categoricalColumns.nonEmpty) {
        val m = TargetEncoder.fitMappings(data, categoricalColumns, targetName)
        (TargetEncoder.applyMappings(data, m), m)
      } else (data, Map.empty[String, Map[String, Int]])

    // Distinct target values (tree.py:110-113). The reference's order is
    // engine-arbitrary; we sort for deterministic class indexing.
    val targets: Seq[Any] =
      encoded.select(col(targetName)).distinct().orderBy(col(targetName)).collect().map(_.get(0)).toSeq

    val tree = buildTree(encoded, featureNames, targetName, targets, depth = 0)
    DecisionTreeModel(tree, mappings, targetType)
  }

  /** Majority class with deterministic smallest-label tie-break
    * (reference: tree.py:166-178 takes an arbitrary row on ties —
    * documented divergence, SURVEY.md §2.11). Planned as
    * TakeOrderedAndProject: no global sort. */
  private def majorityClass(df: DataFrame, targetName: String): Any = {
    val rows = df.groupBy(col(targetName)).agg(count(lit(1)).as("len"))
      .orderBy(col("len").desc, col(targetName).asc)
      .limit(1)
      .collect()
    require(rows.nonEmpty, "majorityClass on empty node")
    rows(0).get(0)
  }

  /** Class counts sorted by class value (reference: tree.py:363-372). */
  private def targetDistribution(df: DataFrame, targetName: String): Seq[Long] =
    df.groupBy(col(targetName)).agg(count(lit(1)).as("count"))
      .orderBy(col(targetName).asc)
      .collect()
      .map(_.getAs[Long]("count"))
      .toSeq

  /** Recursive node build (reference: tree.py:180-385). Per node: ONE
    * all-features split-search job (SplitSearch melt, replacing the
    * reference's per-feature collect_all fan-out) + one tiny distribution
    * job; leaves run one majority job. */
  private def buildTree(
      data: DataFrame,
      featureNames: Seq[String],
      targetName: String,
      targets: Seq[Any],
      depth: Int
  ): TreeNode = {
    if (maxDepth.exists(depth >= _))
      return LeafNode(majorityClass(data, targetName))

    val node = {
      val checkpointed =
        if (checkpointDepthInterval > 0 && depth > 0 && depth % checkpointDepthInterval == 0)
          data.localCheckpoint(eager = false)
        else data
      if (cacheNodes) checkpointed.persist(StorageLevel.MEMORY_AND_DISK) else checkpointed
    }
    try {
      val best = SplitSearch.bestSplit(node, featureNames, targetName, targets, criterion)
      best match {
        case Some(c) if c.informationGain > 0 =>
          // Split by re-applying the predicate on each side — same 3-valued
          // semantics as the reference's materialized mask + ~mask
          // (tree.py:351-358): NULL-feature rows leave both children.
          val pred = col(c.feature).cast("double") <= lit(c.threshold)
          val leftDf = node.where(pred)
          val rightDf = node.where(!pred)
          val left = buildTree(leftDf, featureNames, targetName, targets, depth + 1)
          val right = buildTree(rightDf, featureNames, targetName, targets, depth + 1)
          val dist = targetDistribution(node, targetName)
          SplitNode(c.feature, c.threshold, c.informationGain, c.parentCriterion, dist, left, right)
        case _ =>
          LeafNode(majorityClass(node, targetName))
      }
    } finally {
      if (cacheNodes) node.unpersist(blocking = false)
    }
  }
}
