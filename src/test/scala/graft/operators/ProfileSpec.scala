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
}
