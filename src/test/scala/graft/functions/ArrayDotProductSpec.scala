package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ArrayDotProductSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def df = {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 50).map { i =>
      Row(i.toLong, Seq.fill(16)(rnd.nextGaussian()), Seq.fill(16)(rnd.nextGaussian()))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(
        StructField("id", LongType),
        StructField("a", ArrayType(DoubleType, containsNull = false)),
        StructField("b", ArrayType(DoubleType, containsNull = false)))))
  }

  private def viaBridge(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ArrayDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  test("codegen'd expression is bitwise-identical to the HOF formulation") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val rows = df.select(col("id"), viaBridge(col("a"), col("b")).as("fast"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row ${r.getLong(0)}")
    }
  }

  test("interpreted eval path (no codegen) agrees too") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
      val n = df.select((viaBridge(col("a"), col("b")) === hof).as("eq")).where(!col("eq")).count()
      assert(n == 0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null array yields null; mismatched lengths use the common prefix") {
    val rows = Seq(
      Row(1L, Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0)),
      Row(2L, null, Seq(1.0)))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType),
        StructField("a", ArrayType(DoubleType), nullable = true),
        StructField("b", ArrayType(DoubleType)))))
    val out = d.select(col("id"), viaBridge(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L) == 1.0 * 3.0 + 2.0 * 4.0)
    assert(out(2L) == null)
  }

  test("SQL surface via GraftExtensions: array_dot and array_cosine") {
    // TestSpark's session is built withExtensions(new GraftExtensions)
    val r = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "array_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("type check rejects non-double arrays") {
    val rows = Seq(Row(Seq(1, 2)))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("a", ArrayType(IntegerType)))))
    val e = intercept[Exception] {
      d.select(viaBridge(col("a"), col("a"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
