package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def statuses(old: Seq[(Long, String)], nw: Seq[(Long, String)]) =
    SnapshotDiff.diff(snap(old: _*), snap(nw: _*), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap

  test("all four statuses classify by content, not presence alone") {
    val out = statuses(
      old = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma"),
      nw = Seq(1L -> "alpha", 2L -> "beta edited", 4L -> "delta"))
    assert(out == Map(
      1L -> (("unchanged", None)),
      2L -> (("changed", None)),
      3L -> (("removed", None)),
      4L -> (("added", None))), s"got $out")
  }

  test("a re-keyed doc resolves moved_from to the smallest removed witness") {
    val out = statuses(
      old = Seq(5L -> "same text", 9L -> "same text", 7L -> "other"),
      nw = Seq(7L -> "other", 100L -> "same text"))
    // both 5 and 9 removed with identical content; witness is min id 5
    assert(out(100L) == (("added", Some(5L))), s"got $out")
    assert(out(5L) == (("removed", None)))
    assert(out(9L) == (("removed", None)))
  }

  test("added content duplicating a SURVIVING doc is not a move") {
    val out = statuses(
      old = Seq(1L -> "kept text"),
      nw = Seq(1L -> "kept text", 2L -> "kept text"))
    assert(out(2L) == (("added", None)), s"a copy of a live doc is dedup's finding, not a move: $out")
  }

  test("null text hashes as empty string on both sides") {
    val old = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("doc_id", "text")
    val nw = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
    val out = SnapshotDiff.diff(old, nw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "unchanged"), s"got $out")
  }

  test("summary counts every class once") {
    val d = SnapshotDiff.diff(
      snap(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "moves"),
      snap(1L -> "a", 2L -> "b2", 5L -> "moves", 6L -> "new"),
      "doc_id", "text")
    val s = SnapshotDiff.summary(d).collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4)) ==
      ((2L, 2L, 1L, 1L, 1L)), s"got $s")
  }
}
