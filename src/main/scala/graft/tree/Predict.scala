package graft.tree

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Prediction: three scorers, all semantically aligned.
  *
  * 1. [[scoreExpr]] — the default, Spark-first path: the fitted tree folded
  *    into a single nested `when` chain. One narrow projection, fully
  *    inside whole-stage codegen, no shuffle, no row index, preserves row
  *    order trivially. This replaces the reference's 2^depth
  *    filter-and-union plan (reference: efficient_trees/tree.py:127-136)
  *    which blows up Catalyst analysis at depth ~10 and forces a sort.
  *
  * 2. [[planScore]] — the reference-shaped plan-recursive scorer
  *    (filter left / filter right / union / restore order), kept as a
  *    semantics demo and oracle query (SURVEY.md §2.11, EP2).
  *
  * 3. [[predictRow]] — the pure driver-side walker
  *    (reference: tree.py:147-164), used as the differential oracle in
  *    tests exactly as the reference's own test does (test_tree.py:91-95).
  *
  * NULL semantics: a row whose split feature is NULL falls out of both
  * branches in the reference (filter + negated filter under 3-valued
  * logic). The `when`-chain mirrors this by yielding a NULL prediction
  * (when(<=)...when(>)...otherwise(null)) instead of dropping the row.
  */
object Predict {

  /** The tree as one nested conditional expression. */
  def scoreExpr(model: DecisionTreeModel): Column = {
    def walk(node: TreeNode): Column = node match {
      case LeafNode(v) => lit(v).cast(model.targetType)
      case SplitNode(f, thr, _, _, _, l, r) =>
        val c = col(f).cast(DoubleType)
        when(c <= lit(thr), walk(l))
          .when(c > lit(thr), walk(r))
          .otherwise(lit(null).cast(model.targetType))
    }
    walk(model.tree)
  }

  /** Default scorer: apply categorical mappings, append a `prediction`
    * column (reference: tree.py:117-145, re-expressed as a single pass). */
  def predictMany(model: DecisionTreeModel, df: DataFrame): DataFrame = {
    val mapped = TargetEncoder.applyMappings(df, model.categoricalMappings)
    mapped.withColumn("prediction", scoreExpr(model))
  }

  /** Stable 0..n-1 row ordinal (the reference's `with_row_index`,
    * tree.py:135). `monotonically_increasing_id` is NOT contiguous, so this
    * uses `zipWithIndex` — an extra job, acceptable for the demo scorer
    * only; the default scorer needs no index at all (SURVEY.md §7 hard-part 1).
    */
  def withRowIndex(df: DataFrame, name: String): DataFrame = {
    val spark = df.sparkSession
    val withIdx = df.rdd.zipWithIndex.map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(withIdx, StructType(df.schema.fields :+ StructField(name, LongType, nullable = false)))
  }

  /** Reference-shaped plan-recursive scorer: recursive filter/union over the
    * tree (reference: tree.py:127-136). `keyCols` are carried through so the
    * output is comparable without relying on row order. NULL-feature rows
    * drop out of both branches — exactly the reference's semantics.
    */
  def planScore(model: DecisionTreeModel, df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val mapped = TargetEncoder.applyMappings(df, model.categoricalMappings)
    def walk(node: TreeNode, d: DataFrame): DataFrame = node match {
      case LeafNode(v) =>
        d.select((keyCols.map(col) :+ lit(v).cast(model.targetType).as("prediction")): _*)
      case SplitNode(f, thr, _, _, _, l, r) =>
        val c = col(f).cast(DoubleType)
        val left = walk(l, d.where(c <= lit(thr)))
        val right = walk(r, d.where(c > lit(thr)))
        left.unionByName(right) // diagonal concat (tree.py:131); schemas identical here
    }
    walk(model.tree, mapped)
  }

  /** Driver-side single-sample walker (reference: tree.py:147-164).
    * Categorical values must already be encoded (as in the reference). */
  def predictRow(tree: TreeNode, sample: Map[String, Any]): Any = {
    def toDouble(v: Any): Double = v match {
      case d: Double => d
      case f: Float  => f.toDouble
      case i: Int    => i.toDouble
      case l: Long   => l.toDouble
      case s: Short  => s.toDouble
      case b: Byte   => b.toDouble
      case null      => throw new IllegalArgumentException("null feature in predictRow")
      case other     => other.toString.toDouble
    }
    tree match {
      case LeafNode(v) => v
      case SplitNode(f, thr, _, _, _, l, r) =>
        if (toDouble(sample(f)) <= thr) predictRow(l, sample) else predictRow(r, sample)
    }
  }
}
