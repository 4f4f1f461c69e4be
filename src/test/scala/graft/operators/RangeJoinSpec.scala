package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def frame(cols: (String, DataType)*)(rows: Seq[Any]*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), 2),
      StructType(cols.map { case (n, t) => StructField(n, t) }))

  private val points = frame("k" -> LongType, "ts" -> LongType, "p" -> StringType)(
    Seq[Any](1L, 5L, "a"), Seq[Any](1L, 10L, "b"), Seq[Any](1L, 99L, "c"),
    Seq[Any](2L, 5L, "d"))

  private val intervals = frame(
    "k" -> LongType, "s" -> LongType, "e" -> LongType, "name" -> StringType)(
    Seq[Any](1L, 0L, 7L, "i1"),   // contains a (5), boundary-inclusive
    Seq[Any](1L, 5L, 12L, "i2"),  // overlaps i1: contains a AND b
    Seq[Any](1L, 50L, 60L, "i3"), // contains nothing
    Seq[Any](2L, 0L, 7L, "i4"))   // other key: contains d only

  private def run(binWidth: Long) =
    RangeJoin.rangeJoin(points, intervals, "k", "ts", "s", "e",
      rightCols = Seq("name"), binWidth = binWidth)
      .collect().map(r => (r.getString(2), r.getString(3))).toSet

  test("containment pairs: overlapping intervals both match, boundaries inclusive") {
    val expected = Set("a" -> "i1", "a" -> "i2", "b" -> "i2", "d" -> "i4")
    // several bin widths, including ones that split intervals across bins
    for (w <- Seq(1L, 3L, 8L, 1000L)) {
      assert(run(w) == expected, s"binWidth=$w")
    }
  }

  test("points outside every interval and empty bins drop out (inner join)") {
    assert(!run(8L).exists(_._1 == "c"), "ts 99 is inside no interval")
  }

  test("pathological interval fails loudly instead of exploding") {
    val huge = frame("k" -> LongType, "s" -> LongType, "e" -> LongType, "name" -> StringType)(
      Seq[Any](1L, 0L, 100000L, "bad"))
    val e = intercept[Exception] {
      RangeJoin.rangeJoin(points, huge, "k", "ts", "s", "e", Seq("name"),
        binWidth = 1L, maxBinsPerInterval = 16).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("spans more than 16 bins")), e.toString)
  }

  test("overlap join: inclusive endpoints, cross-key exclusion, each pair ONCE") {
    val got = RangeJoin.overlapJoin(intervals, intervals, "k", "s", "e", "s", "e",
        rightCols = Seq("name"), binWidth = 10L)
      .select("name", "r_name")
      .collect().map(r => (r.getString(0), r.getString(1)))
    // duplicates would show up as repeated tuples — the first-shared-bin
    // rule must emit each pair exactly once even when they share 2 bins
    assert(got.length == got.distinct.length, s"duplicate pairs: ${got.toSeq}")
    val set = got.toSet
    assert(set.contains(("i1", "i2")) && set.contains(("i2", "i1")),
      "i1 [0,7] and i2 [5,12] overlap")
    assert(set.contains(("i1", "i1")), "self-overlap under left==right input")
    assert(!set.contains(("i1", "i3")) && !set.contains(("i2", "i3")))
    assert(!set.exists { case (a, b) => (a == "i4") != (b == "i4") },
      "cross-key pairs must not appear")
  }

  test("overlap join differential vs brute force on random intervals") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 200).map { i =>
      val s = rnd.nextInt(1000).toLong
      Seq[Any]((i % 3).toLong, i.toLong, s, s + rnd.nextInt(80).toLong)
    }
    val iv = frame("k" -> LongType, "id" -> LongType, "s" -> LongType, "e" -> LongType)(rows: _*)
    for (binWidth <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.overlapJoin(iv, iv, "k", "s", "e", "s", "e",
          rightCols = Seq("id"), binWidth = binWidth)
        .where(org.apache.spark.sql.functions.col("id") <
          org.apache.spark.sql.functions.col("r_id"))
        .select("id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length, s"dup pairs at binWidth=$binWidth")
      val brute = (for {
        Seq(ka, ia, sa, ea) <- rows.map(_.map(_.asInstanceOf[Long]))
        Seq(kb, ib, sb, eb) <- rows.map(_.map(_.asInstanceOf[Long]))
        if ka == kb && ia < ib && sa <= eb && sb <= ea
      } yield (ia, ib)).toSet
      assert(got.toSet == brute, s"binWidth=$binWidth")
    }
  }

  test("overlap join plans WITHOUT a dedup exchange (first-shared-bin filter, not distinct)") {
    val plan = RangeJoin.overlapJoin(intervals, intervals, "k", "s", "e", "s", "e",
        rightCols = Seq("name"), binWidth = 10L)
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      case d: org.apache.spark.sql.catalyst.plans.logical.Deduplicate => d
    }
    assert(aggs.isEmpty, s"pair dedup must be the map-side bin filter, found: $aggs")
    assert(!plan.toString.contains("CartesianProduct"))
  }

  test("inverted and null intervals are dropped, not matched") {
    val weird = frame("k" -> LongType, "s" -> LongType, "e" -> LongType, "name" -> StringType)(
      Seq[Any](1L, 10L, 5L, "inverted"), Seq[Any](1L, null, 7L, "nullstart"))
    val out = RangeJoin.rangeJoin(points, weird, "k", "ts", "s", "e", Seq("name"), 4L)
    assert(out.count() == 0)
  }
}
