package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The approx-percentile scale path has no cross-engine oracle (the
  * sketch's merge order is engine-specific), so its correctness contract
  * is pinned HERE instead: Spark's approx_percentile guarantees a rank
  * error of at most 1/accuracy, so for every group the approx value must
  * lie inside the exact percentile bracket [q - eps, q + eps]. We assert
  * at eps = 100/accuracy — two orders of magnitude of slack over the
  * guarantee, still tight enough that a broken sketch (or a silently
  * swapped column) fails loudly.
  */
class ApproxPercentileSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("grouped approx percentiles sit inside the exact rank-error bracket") {
    val accuracy = 10000
    val eps = 100.0 / accuracy // 0.01
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val qs = Seq(0.5, 0.95)
    val aggs = qs.flatMap { q =>
      Seq(
        percentile(col("l_extendedprice"), lit(q - eps)).as(f"lo_$q%.2f"),
        percentile(col("l_extendedprice"), lit(q + eps)).as(f"hi_$q%.2f"),
        approx_percentile(col("l_extendedprice"), lit(q), lit(accuracy)).as(f"ap_$q%.2f"))
    }
    val rows = li.groupBy(col("l_returnflag").as("target"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    assert(rows.length == 3, "expected the three l_returnflag groups")
    rows.foreach { r =>
      val target = r.getString(0)
      qs.zipWithIndex.foreach { case (q, i) =>
        val lo = r.getDouble(1 + i * 3)
        val hi = r.getDouble(2 + i * 3)
        val ap = r.getDouble(3 + i * 3)
        assert(lo <= ap && ap <= hi,
          s"group $target q=$q: approx $ap outside exact bracket [$lo, $hi]")
      }
    }
  }

  test("the catalog's approx entry emits all-true brackets over the exact entry's groups") {
    val sfDir = "/root/testdata/sf0.001"
    val approx = graft.QueryCatalog.queries("group_percentiles_approx")(spark, sfDir)
    assert(approx.columns.toSeq == Seq("target", "p50_in_bracket", "p95_in_bracket"))
    val rows = approx.collect()
    val eKeys = graft.QueryCatalog.queries("group_percentiles")(spark, sfDir)
      .select("target").collect().map(_.getString(0)).toSeq
    assert(rows.map(_.getString(0)).toSeq == eKeys, "same groups in the same order")
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2),
        s"group ${r.getString(0)}: approx outside its exact rank-error bracket")
    }
  }
}
