package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CountMinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def items(rows: Seq[String], parts: Int = 4): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_)), parts),
      StructType(Seq(StructField("item", StringType))))

  private def skewed: Seq[String] =
    (0 until 8).flatMap(i => Seq.fill(1 << (8 - i))(s"h$i")) ++
      (0 until 500).map(i => s"t$i")

  private def estimateAll(data: Seq[String], depth: Int, width: Int): Map[String, Long] = {
    val df = items(data)
    val cms = CountMin.sketch(df, "item", depth, width)
    val qs = df.distinct()
    CountMin.estimates(cms, qs, "item", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount, and are exact when width is generous") {
    val data = skewed
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val wide = estimateAll(data, depth = 4, width = 65536)
    assert(wide == exact, "collision-free width must be exact")
    val narrow = estimateAll(data, depth = 4, width = 64)
    exact.foreach { case (k, n) =>
      assert(narrow(k) >= n, s"undercount for $k: ${narrow(k)} < $n")
    }
  }

  test("CMS error bound holds: overcount <= 2eN/width for every key at depth 4") {
    val data = skewed
    val n = data.size.toLong
    val width = 64
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = estimateAll(data, depth = 4, width = width)
    val bound = math.ceil(2 * math.E * n.toDouble / width).toLong
    exact.foreach { case (k, ex) =>
      assert(est(k) - ex <= bound,
        s"$k overcounted by ${est(k) - ex} > $bound")
    }
  }

  test("sketch is partitioning-independent and bounded at depth*width rows") {
    val a = CountMin.sketch(items(skewed, 1), "item", 3, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val b = CountMin.sketch(items(skewed, 17), "item", 3, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.size <= 3 * 32)
  }

  test("never-inserted keys estimate 0 when their cells are empty") {
    val cms = CountMin.sketch(items(Seq("a", "a", "b")), "item", 4, 65536)
    val est = CountMin.estimates(cms, items(Seq("zzz-never")), "item", 4, 65536)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("zzz-never") == 0L)
  }

  test("null items are ignored in the build") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("x"), Row(null), Row("x")), 2),
      StructType(Seq(StructField("item", StringType))))
    val cms = CountMin.sketch(df, "item", 2, 16)
    val total = cms.agg(sum("cnt")).head().getLong(0)
    assert(total == 2L * 2L, "2 rows x depth 2 cells")
  }
}
