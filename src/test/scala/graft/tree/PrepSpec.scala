package graft.tree

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PrepSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("fillNull replaces nulls in selected columns only") {
    val rows = Seq(Row(java.lang.Double.valueOf(1.5), null), Row(null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("a", DoubleType, true), StructField("b", DoubleType, true))))
    val filled = Prep.fillNull(df, 0.0, Seq("a")).collect()
    assert(filled.map(r => (r.get(0), r.get(1))).toSet == Set((1.5, null), (0.0, null)))
    val all = Prep.fillNull(df, -1.0).collect()
    assert(all.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("shrinkDtypes downcasts to smallest fitting integer type") {
    val rows = Seq(Row(100L, 40000L, 3000000000L), Row(-5L, -40000L, 12L))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("tiny", LongType), StructField("mid", LongType),
        StructField("big", LongType))))
    val shrunk = Prep.shrinkDtypes(df)
    assert(shrunk.schema("tiny").dataType == ByteType)
    assert(shrunk.schema("mid").dataType == IntegerType) // 40000 overflows Short
    assert(shrunk.schema("big").dataType == LongType)
    // values preserved
    assert(shrunk.orderBy("tiny").collect().map(_.get(0)).toSeq == Seq((-5).toByte, 100.toByte))
  }

  test("shrinkDtypes leaves doubles/strings untouched and never widens") {
    val rows = Seq(Row(1.5, "x", 7))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("d", DoubleType), StructField("s", StringType),
        StructField("i", IntegerType))))
    val shrunk = Prep.shrinkDtypes(df)
    assert(shrunk.schema("d").dataType == DoubleType)
    assert(shrunk.schema("s").dataType == StringType)
    assert(shrunk.schema("i").dataType == ByteType)
  }

  test("trainTestSplit partitions the data deterministically") {
    import spark.implicits._
    val df = spark.range(1000).toDF("id")
    val (tr1, te1) = Prep.trainTestSplit(df, 0.3)
    val (tr2, te2) = Prep.trainTestSplit(df, 0.3)
    assert(tr1.count() + te1.count() == 1000)
    assert(te1.select("id").collect().map(_.getLong(0)).toSet ==
      te2.select("id").collect().map(_.getLong(0)).toSet) // same seed, same split
    assert(tr1.intersect(te1).count() == 0)
  }
}
