package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

class Sq8AdcCosineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // two tinyint code arrays + the shared param arrays, dim 16
  private def df = {
    val rnd = new scala.util.Random(23)
    val mins = Seq.fill(16)(rnd.nextGaussian())
    val widths = Seq.fill(16)(math.abs(rnd.nextGaussian()) + 0.1)
    val rows = (0 until 60).map { i =>
      Row(i.toLong,
        Seq.fill(16)((rnd.nextInt(256) - 128).toByte),
        Seq.fill(16)((rnd.nextInt(256) - 128).toByte),
        mins, widths)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(
        StructField("id", LongType),
        StructField("ca", ArrayType(ByteType, containsNull = false)),
        StructField("cb", ArrayType(ByteType, containsNull = false)),
        StructField("mins", ArrayType(DoubleType, containsNull = false)),
        StructField("widths", ArrayType(DoubleType, containsNull = false)))))
  }

  private def viaBridge(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      m: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Sq8AdcCosine(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(m),
      ColumnBridge.expression(w)))
  }

  test("fused ADC cosine is bitwise-identical to dequantize-then-cosine") {
    // the exact HOF formulation the expression replaced — the IEEE
    // parity contract in the scaladoc, asserted bit for bit
    def dequant(c: org.apache.spark.sql.Column) = transform(c, (x, i) =>
      element_at(col("mins"), i + 1) +
        (x.cast("int") + lit(128)).cast("double") *
          element_at(col("widths"), i + 1) / lit(255.0))
    val rows = df.select(col("id"),
        viaBridge(col("ca"), col("cb"), col("mins"), col("widths")).as("fast"),
        Similarity.cosine(dequant(col("ca")), dequant(col("cb"))).as("ref"))
      .collect()
    assert(rows.length == 60)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row ${r.getLong(0)}")
    }
  }

  test("null inputs give null; wrong types are rejected at analysis") {
    val withNull = df.withColumn("ca",
      when(col("id") % 2 === 0, col("ca")))
    val out = withNull.select(col("id"),
        viaBridge(col("ca"), col("cb"), col("mins"), col("widths")).as("c"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(1) == (r.getLong(0) % 2 == 1), s"row $r")
    }
    val e = intercept[Exception] {
      df.select(viaBridge(col("mins"), col("cb"), col("mins"), col("widths")))
        .collect()
    }
    assert(e.getMessage.contains("sq8_adc_cosine") ||
      e.getMessage.contains("ARRAY<TINYINT>") || e.getMessage.contains("array<tinyint>"),
      e.getMessage)
  }
}
