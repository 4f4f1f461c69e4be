package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Branch-for-branch parity of the native scatter-add against the
  * Catalyst `aggregate(transform(...))` fold it replaces in
  * [[TextFunctions.hashedVector]] (r20): same left-to-right FP addition
  * order, element/bucket null skip, out-of-range bucket skip, null-sign
  * slot poisoning, and null-in -> null-out. */
class ScatterAddVectorSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dim = 8

  private val elemType = ArrayType(StructType(Seq(
    StructField("b", IntegerType), StructField("s", DoubleType))))

  /** The exact fold ScatterAddVector replaced, kept here as the spec's
    * independent model. */
  private def foldModel(keyed: org.apache.spark.sql.Column) =
    aggregate(
      keyed,
      array_repeat(lit(0.0d), dim),
      (acc, e) => transform(acc, (x, i) =>
        when(i === e.getField("b"), x + e.getField("s")).otherwise(x)))

  private def scatter(keyed: org.apache.spark.sql.Column) =
    ColumnBridge.column(ScatterAddVector(ColumnBridge.expression(keyed), dim))

  test("native scatter-add matches the aggregate fold on every branch") {
    def e(b: java.lang.Integer, s: java.lang.Double): Row = Row(b, s)
    val cases: Seq[Seq[Row]] = Seq(
      Seq.empty, // empty array -> all zeros
      Seq(e(0, 1.0), e(0, -1.0), e(7, 1.0)), // accumulate + cancel
      Seq(e(3, 0.1), e(3, 0.2), e(3, 0.3)), // FP order matters: 0.1+0.2+0.3
      Seq(e(-1, 1.0), e(8, 1.0), e(100, 1.0)), // out-of-range skipped
      Seq(null, e(2, 1.0)), // null element skipped
      Seq(e(null, 1.0), e(2, 1.0)), // null bucket skipped
      Seq(e(5, null), e(5, 1.0), e(1, 1.0)), // null sign zeroes/freezes slot 5 only
      Seq(e(4, 1.0), e(4, null)) // add THEN poison: reads back 0.0
    )
    val rows = cases.map(c => Row(c))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("keyed", elemType))))

    val got = df.select(
      scatter(col("keyed")).as("n"), foldModel(col("keyed")).as("f")).collect()
    got.foreach { r =>
      val n = r.getSeq[java.lang.Double](0)
      val f = r.getSeq[java.lang.Double](1)
      assert(n.size == dim && f.size == dim, s"row $r")
      n.zip(f).zipWithIndex.foreach { case ((x, y), i) =>
        val same = (x == null && y == null) ||
          (x != null && y != null && x.doubleValue == y.doubleValue)
        assert(same, s"slot $i: native=$x fold=$y (row $r)")
      }
    }
  }

  test("null input array -> null (matching the null-intolerant fold)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null)), 1),
      StructType(Seq(StructField("keyed", elemType))))
    val got = df.select(
      scatter(col("keyed")).as("n"), foldModel(col("keyed")).as("f")).collect()
    assert(got.head.isNullAt(0) && got.head.isNullAt(1))
  }

  test("hashedVector end-to-end matches the fold it replaced, both hashes") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog the the the",
      "  Mixed   CASE\ttokens\nand punctuation, repeated repeated  ",
      "", "   ", "one")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map(Row(_)), 2),
      StructType(Seq(StructField("text", StringType))))
    val hashes: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
      Seq(c => xxhash64(c), g => graft.operators.Dedup.md5TokenHash60(g))
    hashes.foreach { h =>
      val d = 64
      val toks = filter(
        split(regexp_replace(lower(trim(coalesce(col("text"), lit("")))), "\\s+", " "), " "),
        t => length(t) > lit(0))
      val keyed = transform(toks, tok => struct(
        pmod(h(tok), lit(d.toLong)).cast("int").as("b"),
        when(pmod(h(concat(tok, lit("#sgn"))), lit(2L)) === 0, lit(1.0d))
          .otherwise(lit(-1.0d)).as("s")))
      val fold = aggregate(
        keyed,
        array_repeat(lit(0.0d), d),
        (acc, e) => transform(acc, (x, i) =>
          when(i === e.getField("b"), x + e.getField("s")).otherwise(x)))
      val got = df.select(
        TextFunctions.hashedVector(col("text"), d, h).as("n"),
        fold.as("f")).collect()
      got.foreach { r =>
        assert(r.getSeq[Double](0) == r.getSeq[Double](1), s"row $r")
      }
    }
  }
}
