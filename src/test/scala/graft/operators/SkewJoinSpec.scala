package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 90%-hot fact table: key 0 holds most rows */
  private def fact(n: Int): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize((0 until n).map { i =>
        Row(if (i % 10 == 0) (i % 7).toLong + 1L else 0L, i.toLong, s"p$i")
      }, 8),
      StructType(Seq(StructField("k", LongType), StructField("v", LongType),
        StructField("tag", StringType))))

  private def dim: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize((0L to 7L).map(k => Row(k, s"dim$k")), 2),
      StructType(Seq(StructField("k", LongType), StructField("d", StringType))))

  private def asSet(df: DataFrame): Set[(Long, Long, String, String)] =
    df.select("k", "v", "tag", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet

  test("salted join is row-identical to the plain join") {
    val f = fact(2000)
    val plain = f.join(dim, Seq("k"))
    val salted = SkewJoin.saltedInnerJoin(f, dim, Seq("k"), numSalts = 8)
    assert(asSet(salted) == asSet(plain))
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
  }

  test("result is partitioning- and retry-deterministic (content-hash salt)") {
    val a = asSet(SkewJoin.saltedInnerJoin(fact(500), dim, Seq("k"), 4))
    val f1 = fact(500).repartition(23)
    val b = asSet(SkewJoin.saltedInnerJoin(f1, dim, Seq("k"), 4))
    assert(a == b)
  }

  test("the hot key's rows spread across salts") {
    val f = fact(3000)
    val salted = f.withColumn("__salt",
      pmod(xxhash64(f.columns.map(col).toIndexedSeq: _*), lit(8)))
    val hot = salted.where(col("k") === 0L)
      .groupBy("__salt").count().collect().map(_.getLong(1))
    val total = hot.sum
    assert(hot.length == 8, s"hot key must occupy all 8 salt buckets, got ${hot.length}")
    assert(hot.max <= total / 8 * 2,
      s"max salt bucket ${hot.max} should be near total/8 = ${total / 8}")
  }

  test("shuffle join keys include the salt (the whole point)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SkewJoin.saltedInnerJoin(fact(100), dim, Seq("k"), 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("multi-key join and numSalts lower bound") {
    val f = fact(200).withColumn("k2", col("k") % 2)
    val d2 = dim.withColumn("k2", col("k") % 2)
    val plain = f.join(d2, Seq("k", "k2"))
    val salted = SkewJoin.saltedInnerJoin(f, d2, Seq("k", "k2"), 4)
    assert(salted.count() == plain.count())
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(f, d2, Seq("k", "k2"), 1)
    }
  }
}
