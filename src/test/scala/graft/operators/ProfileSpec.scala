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

  test("psi: identical snapshots give exactly zero on every bin") {
    val df = (1 to 100).map(i => Tuple1(i.toLong)).toDF("v")
    val bins = Profile.psi(df, df, "v", bins = 5).collect()
    assert(bins.length == 5)
    assert(bins.forall(_.getLong(3) == 0L), "p == q => term exactly 0")
    val tot = Profile.psiTotal(df, df, "v", bins = 5).collect().head
    assert(tot.getLong(0) == 100L && tot.getLong(1) == 100L)
    assert(tot.getDouble(2) == 0.0)
  }

  test("psi: shifted distribution is positive; matches a hand replica") {
    val old = (1 to 100).map(i => Tuple1(i.toLong)).toDF("v")
    val neu = (1 to 100).map(i => Tuple1(i.toLong + 40)).toDF("v")
    val out = Profile.psi(old, neu, "v", bins = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // old range [1,100], span 24.75; old: 25/bin. new 41..140: values
    // past 100 clamp into bin 3.
    val span = 99.0 / 4
    val expOld = (0 until 4).map { b =>
      (1L to 100L).count { v =>
        val bin = math.min(math.max(math.floor((v - 1.0) / span), 0), 3)
        bin == b
      }.toLong
    }
    val expNew = (0 until 4).map { b =>
      (41L to 140L).count { v =>
        val bin = math.min(math.max(math.floor((v - 1.0) / span), 0), 3)
        bin == b
      }.toLong
    }
    for (b <- 0 until 4) {
      assert(out(b.toLong)._1 == expOld(b), s"bin $b old")
      assert(out(b.toLong)._2 == expNew(b), s"bin $b new")
      val p = (expOld(b) + 1).toDouble / (100 + 4)
      val q = (expNew(b) + 1).toDouble / (100 + 4)
      assert(out(b.toLong)._3 == math.floor((p - q) * math.log(p / q) * 1e12).toLong,
        s"bin $b term")
    }
    val tot = Profile.psiTotal(old, neu, "v", bins = 4).collect().head
    assert(tot.getDouble(2) > 0.1, s"a 40% shift must trip the PSI alarm, got $tot")
  }

  test("psi: nulls excluded, empty old snapshot rejected loudly") {
    val old = Seq(Some(1L), Some(2L), None, Some(3L)).toDF("v")
    val neu = Seq(Some(1L), None).toDF("v")
    val tot = Profile.psiTotal(old, neu, "v", bins = 2).collect().head
    assert(tot.getLong(0) == 3L && tot.getLong(1) == 1L)
    intercept[IllegalArgumentException] {
      Profile.psi(Seq.empty[Option[Long]].toDF("v"), neu, "v")
    }
  }

  test("psi: NaN/Inf in the old snapshot cannot poison the reference frame") {
    // one NaN (or Inf) reaching the min/max pass used to make the span
    // NaN and collapse every bin — the drift gate silently read ~zero
    // drift on exactly the dirty input it exists to catch. The frame
    // must come from the FINITE old values only.
    val old = ((1 to 100).map(_.toDouble) ++ Seq(Double.NaN, Double.PositiveInfinity))
      .map(Tuple1(_)).toDF("v")
    val neu = (41 to 140).map(i => Tuple1(i.toDouble)).toDF("v")
    val clean = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val dirty = Profile.psi(old, neu, "v", bins = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ref = Profile.psi(clean, neu, "v", bins = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // NaN rows are excluded from the counts (binned already filtered
    // them); the Inf row clamps into the top bin like any excursion —
    // so old counts differ from `ref` by exactly that one top-bin row,
    // and the BINNING (the part NaN used to destroy) is identical.
    assert(dirty(0L)._1 == ref(0L)._1 && dirty(1L)._1 == ref(1L)._1 &&
      dirty(2L)._1 == ref(2L)._1, s"low bins must match the clean frame: $dirty vs $ref")
    assert(dirty(3L)._1 == ref(3L)._1 + 1, "the Inf row clamps into the top bin")
    assert(dirty.values.map(_._2).toSeq.sorted == ref.values.map(_._2).toSeq.sorted,
      "new-side counts must be unaffected")
    val tot = Profile.psiTotal(old, neu, "v", bins = 4).collect().head
    assert(tot.getDouble(2) > 0.1,
      s"the 40% shift must still trip the alarm with a NaN present, got $tot")
    // an old snapshot with ONLY non-finite values has no frame: loud
    intercept[IllegalArgumentException] {
      Profile.psi(Seq(Double.NaN, Double.PositiveInfinity).map(Tuple1(_)).toDF("v"),
        neu, "v")
    }
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
