package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfileSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    (1L, Some("x"), Some(10L)),
    (2L, Some("y"), None),
    (3L, None, Some(10L)),
    (4L, Some("x"), Some(30L))).toDF("id", "s", "v")

  private def run(cols: String*) =
    Profile.columns(frame, cols)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5))))).toMap

  test("exact counts, null counts, cardinalities, and string bounds") {
    val out = run("id", "s", "v")
    assert(out("id") == ((4L, 0L, 4L, Some("1"), Some("4"))), s"got $out")
    assert(out("s") == ((4L, 1L, 2L, Some("x"), Some("y"))), s"got $out")
    assert(out("v") == ((4L, 1L, 2L, Some("10"), Some("30"))), s"got $out")
  }

  test("all-null columns produce null bounds and zero cardinality") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val out = Profile.columns(df, Seq("s")).collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) == ((2L, 2L, 0L)))
    assert(out.isNullAt(4) && out.isNullAt(5))
  }

  test("output is ordered by column name; unknown columns are rejected") {
    assert(Profile.columns(frame, Seq("v", "id", "s")).collect().map(_.getString(0)).toSeq
      == Seq("id", "s", "v"))
    intercept[IllegalArgumentException] { Profile.columns(frame, Seq("nope")) }
    intercept[IllegalArgumentException] { Profile.columns(frame, Seq.empty) }
  }

  test("single aggregation pass: one leaf scan in the plan") {
    val plan = Profile.columns(frame, Seq("id", "s", "v"))
      .queryExecution.optimizedPlan.toString
    val scans = plan.split("\n").count(_.contains("LocalRelation"))
    assert(scans == 1, s"expected one scan of the input, plan:\n$plan")
  }

  test("drift: exact deltas and the null-safe bounds flag") {
    val oldDf = Seq((1L, "x"), (2L, "y"), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val newDf = Seq((1L, "x"), (2L, "y"), (4L, "y"), (5L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val out = Profile.drift(oldDf, newDf, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert((id.getLong(1), id.getLong(2), id.getLong(3)) == ((3L, 4L, 1L)), s"got $id")
    assert((id.getLong(4), id.getLong(5), id.getLong(6)) == ((0L, 0L, 0L)), s"got $id")
    assert((id.getLong(7), id.getLong(8), id.getLong(9)) == ((3L, 4L, 1L)), s"got $id")
    assert(id.getBoolean(10), s"id max moved 3 -> 5, flag must fire: $id")
    val s = out("s")
    assert((s.getLong(4), s.getLong(5), s.getLong(6)) == ((1L, 1L, 0L)), s"got $s")
    assert((s.getLong(7), s.getLong(8), s.getLong(9)) == ((2L, 2L, 0L)), s"got $s")
    assert(!s.getBoolean(10), s"s bounds unchanged, flag must not fire: $s")
  }

  test("drift: an all-null column's null bounds compare null-safe against values") {
    val oldDf = Seq((1L, null.asInstanceOf[String])).toDF("id", "s")
    val newDf = Seq((1L, "now-present")).toDF("id", "s")
    val s = Profile.drift(oldDf, newDf, Seq("s")).collect().head
    assert(s.getBoolean(10),
      s"null -> value bound change must flag (never null out the flag): $s")
  }
}
