package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tree.SplitSearch

/** Branch-for-branch parity of the native array snap against the
  * per-feature `when`-chain it replaces on the binned melt hot path
  * (r20): same chosen edge, same +Infinity overflow, same null -> +Inf
  * coercion on snapped slots, identity (null-preserving) on slots
  * without edges. */
class SnapArrayToEdgesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("native snap matches the snapToEdges when-chain on every branch") {
    val edges = Seq(1.5, 3.0, 7.25)
    val values: Seq[java.lang.Double] = Seq(
      -1e300, 0.0, 1.5, 1.500001, 3.0, 5.0, 7.25, 7.26, 1e300,
      Double.NaN, Double.NegativeInfinity, Double.PositiveInfinity, null)
    val rows = values.map(v => Row(v, v))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("a", DoubleType), StructField("b", DoubleType))))

    // slot 0 snapped by `edges`, slot 1 identity (no edges), slot 2 the
    // melt's sentinel shape (lit 0.0, no edges)
    val packed = array(col("a"), col("b"), lit(0.0))
    val snapped = ColumnBridge.column(SnapArrayToEdges(
      ColumnBridge.expression(packed), Seq(edges, Nil, Nil)))
    val chain = array(
      SplitSearch.snapToEdges(col("a"), edges), col("b"), lit(0.0))

    val got = df.select(snapped.as("s"), chain.as("c")).collect()
    got.foreach { r =>
      val s = r.getSeq[java.lang.Double](0)
      val c = r.getSeq[java.lang.Double](1)
      assert(s.size == c.size)
      s.zip(c).zipWithIndex.foreach { case ((x, y), i) =>
        val same = (x == null && y == null) ||
          (x != null && y != null &&
            (x.doubleValue == y.doubleValue ||
              (x.isNaN && y.isNaN)))
        assert(same, s"slot $i: native=$x chain=$y (row $r)")
      }
    }
  }
}
