package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HeavyHittersSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def items(rows: Seq[String], parts: Int = 4) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_)), parts),
      StructType(Seq(StructField("item", StringType))))

  /** deterministic skewed stream: item "h<i>" appears ~2^(10-i) times */
  private def skewed: Seq[String] =
    (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"h$i")) ++
      (0 until 3000).map(i => s"tail$i")

  test("exact regime: identical to groupBy.count, max_err = 0") {
    val data = skewed
    val df = items(data)
    val out = HeavyHitters.frequentItems(df, "item", capacity = 8192)
      .orderBy(desc("n"), asc("item")).collect()
    assert(out.forall(_.getLong(2) == 0L), "max_err must be 0 when distinct <= capacity")
    assert(out.forall(_.getLong(3) == data.size.toLong), "total must count all items")
    val exact = df.groupBy("item").count()
      .orderBy(desc("count"), asc("item")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == exact.toSeq)
  }

  test("exact regime is partitioning-independent") {
    val a = HeavyHitters.topK(items(skewed, parts = 1), "item", 8192, 5).collect().toSeq
    val b = HeavyHitters.topK(items(skewed, parts = 17), "item", 8192, 5).collect().toSeq
    assert(a.map(r => (r.getString(0), r.getLong(1))) == b.map(r => (r.getString(0), r.getLong(1))))
  }

  test("approximate regime: MG guarantees hold under a tiny capacity") {
    val data = skewed
    val n = data.size.toLong
    val cap = 64 // far below the ~3010 distinct items
    val out = HeavyHitters.frequentItems(items(data), "item", cap).collect()
    val got = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxErr = out.head.getLong(2)
    assert(maxErr > 0L, "tiny capacity over 3k distinct items must have decremented")
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // every item with true count > N/(cap+1) must be present
    val mustHave = truth.filter(_._2 > n / (cap + 1)).keySet
    assert(mustHave.subsetOf(got.keySet),
      s"missing guaranteed heavy hitters: ${mustHave -- got.keySet}")
    // counts under-estimate by at most the reported max_err
    got.foreach { case (k, c) =>
      val t = truth(k)
      assert(c <= t, s"$k over-estimated: $c > $t")
      assert(c >= t - maxErr, s"$k under-estimated beyond bound: $c < $t - $maxErr")
    }
  }

  test("null items are skipped, not counted") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a"), Row(null), Row("a"), Row("b")), 2),
      StructType(Seq(StructField("item", StringType))))
    val out = HeavyHitters.frequentItems(df, "item", 16)
      .orderBy(desc("n"), asc("item")).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L), ("b", 1L)))
    assert(out.head.getLong(3) == 3L)
  }

  test("hotGrams document frequency matches exact computation") {
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "the cat sat on the mat"),
        Row(2L, "the cat sat on a hat"),
        Row(3L, "the cat sat on the mat"), // exact dup of 1
        Row(4L, "short doc")), 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val out = HeavyHitters.hotGrams(docs, "text", n = 3, capacity = 256, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "the cat sat" / "cat sat on" appear in docs 1,2,3 -> df 3
    assert(out.take(2).toSet == Set(("cat sat on", 3L), ("the cat sat", 3L)))
    assert(out(2)._2 == 2L) // next tier: grams shared by the duplicate pair
  }

  test("stopGrams returns only grams at or above minDf") {
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 20L).map(i => Row(i, s"boilerplate banner line unique$i token$i")), 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val stops = HeavyHitters.stopGrams(docs, "text", n = 3, capacity = 1024, minDf = 10L)
    assert(stops.contains("boilerplate banner line"))
    assert(stops.forall(g => g.startsWith("boilerplate") || g.startsWith("banner")))
  }

  test("plan has no item-keyed shuffle: single aggregate, one final exchange") {
    val df = items(skewed)
    val plan = HeavyHitters.topK(df, "item", 1024, 5)
      .queryExecution.executedPlan.toString
    // the groupBy.count formulation would hash-partition on the item; the
    // sketch plan's only exchange is the SinglePartition final merge
    assert(!plan.contains("hashpartitioning(item"),
      s"unexpected item-keyed exchange in:\n$plan")
  }

  test("per-group top-k: exact per group in the exact regime, rank tie-break on item") {
    val rows = Seq(
      "en" -> "a", "en" -> "a", "en" -> "a", "en" -> "b", "en" -> "b", "en" -> "c",
      "de" -> "x", "de" -> "x", "de" -> "y")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (g, i) => Row(g, i) }, 3),
      StructType(Seq(StructField("lang", StringType), StructField("item", StringType))))
    val out = HeavyHitters.topKPerGroup(df, "lang", "item", capacity = 64, k = 2)
      .collect().map(r => (r.getString(0), r.getInt(4)) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(("en", 1)) == (("a", 3L, 0L)))
    assert(out(("en", 2)) == (("b", 2L, 0L)))
    assert(out(("de", 1)) == (("x", 2L, 0L)))
    assert(out(("de", 2)) == (("y", 1L, 0L)))
    // the k cut is per group, not global
    assert(out.size == 4)
  }
}
