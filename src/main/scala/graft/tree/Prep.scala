package graft.tree

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Caller-side data preparation helpers mirroring what the reference's
  * examples do before `fit` (reference: examples/amex_default.py:23,34,
  * examples/heart_disease.py:34 — `fill_null(0.0)` on every feature).
  */
object Prep {

  /** Replace nulls with `value` in `cols` (all numeric columns when empty) —
    * the reference's `fill_null(0.0)` (P9). Delegates to `DataFrameNaFunctions`
    * so the replacement stays inside codegen'd projections. */
  def fillNull(df: DataFrame, value: Double, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.na.fill(value) else df.na.fill(value, cols)

  /** The reference's `shrink_dtype()` (P2, tree.py:90): downcast every
    * integral column to the smallest integer type that fits its observed
    * min/max. One min/max aggregation job over the named columns, then a
    * cast projection. Under Tungsten/parquet encodings this buys little at
    * rest (SURVEY.md §1 documents it as an acceptable no-op), but it
    * halves shuffle row width when narrow ints flow through wide joins —
    * worth it before a heavy shuffle, pointless before a scan-only plan.
    * Floating/date/string columns pass through untouched. */
  def shrinkDtypes(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val candidates = (if (cols.isEmpty) df.schema.fields.toSeq
                      else df.schema.fields.toSeq.filter(f => cols.contains(f.name)))
      .filter(f => f.dataType == LongType || f.dataType == IntegerType || f.dataType == ShortType)
    if (candidates.isEmpty) return df
    val aggs = candidates.flatMap(f =>
      Seq(min(col(f.name)).as(s"__mn_${f.name}"), max(col(f.name)).as(s"__mx_${f.name}")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def fits(lo: Long, hi: Long, t: DataType): Boolean = t match {
      case ByteType    => lo >= Byte.MinValue && hi <= Byte.MaxValue
      case ShortType   => lo >= Short.MinValue && hi <= Short.MaxValue
      case IntegerType => lo >= Int.MinValue && hi <= Int.MaxValue
      case _           => true
    }
    candidates.foldLeft(df) { (d, f) =>
      val i = row.fieldIndex(s"__mn_${f.name}")
      if (row.isNullAt(i)) d // all-null column: nothing to learn
      else {
        val (lo, hi) = (toLong(row.get(i)), toLong(row.get(row.fieldIndex(s"__mx_${f.name}"))))
        val target = Seq(ByteType, ShortType, IntegerType, LongType)
          .find(t => fits(lo, hi, t)).get
        if (target == f.dataType ||
            Seq(ByteType, ShortType, IntegerType, LongType).indexOf(target) >=
              Seq(ByteType, ShortType, IntegerType, LongType).indexOf(f.dataType)) d
        else d.withColumn(f.name, col(f.name).cast(target))
      }
    }
  }

  private def toLong(v: Any): Long = v match {
    case l: Long  => l
    case i: Int   => i.toLong
    case s: Short => s.toLong
    case b: Byte  => b.toLong
    case other    => other.toString.toLong
  }

  /** Train/test split (O7, reference: examples/heart_disease.py:22-26 uses
    * slice/sample): Spark-native `randomSplit` with a fixed seed. */
  def trainTestSplit(df: DataFrame, testFraction: Double = 0.3, seed: Long = 42L)
      : (DataFrame, DataFrame) = {
    require(testFraction > 0 && testFraction < 1, "testFraction in (0,1)")
    val Array(train, test) = df.randomSplit(Array(1.0 - testFraction, testFraction), seed)
    (train, test)
  }
}
