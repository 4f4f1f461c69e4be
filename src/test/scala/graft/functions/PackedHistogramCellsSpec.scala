package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tree.SplitSearch

/** Differential pin of the fused melt+histogram aggregate (r21) against
  * the exploded posexplode + hash-aggregate formulation it replaces on
  * the fully binned pipeline path: identical observed cells — feature
  * index, snapped value (incl. the +Inf overflow, null -> +Inf, NaN ->
  * +Inf coercions), per-class conditional counts, count_examples — on
  * adversarial data (nulls, NaN, +/-Inf values, values on/between/past
  * edges, null targets, multiple nodes). The model is the REAL exploded
  * pipeline run through collect, not hand-derived semantics (see the
  * r20 ScatterAddVector lesson: parity is with the replaced plan's
  * observable output).
  */
class PackedHistogramCellsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val features = Seq("fa", "fb", "fc")
  private val edges = Map(
    "fa" -> Seq(1.5, 3.0, 7.25),
    "fb" -> Seq(0.0, 10.0),
    "fc" -> Seq(-2.0))
  private val targets: Seq[Any] = Seq("x", "y", "z")

  private def df: DataFrame = {
    val vals: Seq[java.lang.Double] = Seq(
      -1e300, -2.0, -1.99, 0.0, 1.5, 1.500001, 3.0, 5.0, 7.25, 7.26, 1e300,
      Double.NaN, Double.NegativeInfinity, Double.PositiveInfinity, null)
    val rows = for {
      (a, i) <- vals.zipWithIndex
      (b, j) <- vals.reverse.zipWithIndex
    } yield Row(a, b, vals((i + j) % vals.size),
      if ((i + 2 * j) % 7 == 6) null else targets((i + j) % targets.size).toString,
      (i * 3 + j) % 4)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 5),
      StructType(Seq(
        StructField("fa", DoubleType), StructField("fb", DoubleType),
        StructField("fc", DoubleType), StructField("t", StringType),
        StructField("__node", IntegerType, nullable = false))))
  }

  /** Collected cell rows as a comparable multiset keyed on every column. */
  private def cellSet(frame: DataFrame): Map[Seq[Any], Int] = {
    val cols = Seq("__node", "feature", "feature_value") ++
      targets.indices.map(i => s"class_${i}_count") :+ "count_examples"
    frame.select(cols.map(col): _*).collect()
      .map(_.toSeq.map {
        // NaN != NaN breaks Map-key equality; compare the raw bits
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case o         => o
      }).groupBy(identity).map { case (k, v) => k -> v.size }
  }

  test("fused cells match the exploded melt bit for bit on adversarial data") {
    val d = df
    val fused = SplitSearch.meltedHistogramIdxFused(
      d, features, "t", targets, edges, Seq("__node"))
    val exploded = SplitSearch.meltedHistogramIdxExploded(
      d, features, "t", targets, edges, Seq("__node"))
    val f = cellSet(fused)
    val e = cellSet(exploded)
    assert(f == e, s"fused=$f\nexploded=$e")
    assert(f.nonEmpty)
    // dispatcher takes the fused path when every feature has finite edges
    val dispatched = cellSet(SplitSearch.meltedHistogramIdx(
      d, features, "t", targets, edges, Seq("__node")))
    assert(dispatched == e)
  }

  test("dispatcher falls back to the exploded melt when a feature lacks edges") {
    val d = df
    val partial = edges - "fb" // fb keeps exact values -> not fusible
    val viaDispatch = SplitSearch.meltedHistogramIdx(
      d, features, "t", targets, partial, Seq("__node"))
    assert(viaDispatch.queryExecution.executedPlan.toString.contains("posexplode"),
      "mixed-edge melt must stay on the exploded path")
    assert(cellSet(viaDispatch) == cellSet(SplitSearch.meltedHistogramIdxExploded(
      d, features, "t", targets, partial, Seq("__node"))))
  }

  test("fused plan carries no generator over the input rows (aggregate before inline)") {
    val d = df
    val fused = SplitSearch.meltedHistogramIdx(
      d, features, "t", targets, edges, Seq("__node"))
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("packed_histogram_cells"), plan)
    assert(!plan.contains("posexplode"), plan)
  }

  test("single-edge slots and -0.0 edges normalize like the hash aggregate") {
    val rows = Seq(
      Row(java.lang.Double.valueOf(-0.5), "x", 0),
      Row(java.lang.Double.valueOf(-0.0), "y", 0),
      Row(java.lang.Double.valueOf(0.5), "y", 0),
      Row(null, "z", 0))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("fa", DoubleType), StructField("t", StringType),
        StructField("__node", IntegerType, nullable = false))))
    val e = Map("fa" -> Seq(-0.0))
    val fused = SplitSearch.meltedHistogramIdxFused(
      d, Seq("fa"), "t", Seq[Any]("x", "y", "z"), e, Seq("__node"))
    val exploded = SplitSearch.meltedHistogramIdxExploded(
      d, Seq("fa"), "t", Seq[Any]("x", "y", "z"), e, Seq("__node"))
    val cols = Seq("__node", "feature", "feature_value", "class_0_count",
      "class_1_count", "class_2_count", "count_examples")
    def set(fr: DataFrame) = fr.select(cols.map(col): _*).collect()
      .map(r => (r.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case o         => o
      })).toSet
    assert(set(fused) == set(exploded))
  }
}
