package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ShufflingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Long) = (1L to n).map(i => (i, s"doc $i")).toDF("doc_id", "text")

  test("deterministic shuffle: same order every run, different per seed") {
    val d = ids(500)
    val a = Shuffling.deterministicShuffle(d, "doc_id", 7L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val b = Shuffling.deterministicShuffle(d, "doc_id", 7L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "same seed must reproduce the exact order")
    val c = Shuffling.deterministicShuffle(d, "doc_id", 8L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(a != c, "different seeds must permute differently")
    assert(a.sorted == (1L to 500L), "shuffle is a permutation — nothing lost or duplicated")
  }

  test("the order actually mixes: no long runs of consecutive ids") {
    val out = Shuffling.deterministicShuffle(ids(1000), "doc_id", 42L)
      .select("doc_id").collect().map(_.getLong(0))
    val consecutive = out.sliding(2).count { case Array(x, y) => y == x + 1 }
    // a uniform permutation has ~1 consecutive pair in 1000; allow slack
    assert(consecutive < 20, s"$consecutive consecutive pairs — not shuffled")
  }

  test("shard: stable assignment in range, roughly balanced") {
    val out = Shuffling.shard(ids(4000), "doc_id", numShards = 8, seed = 42L)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(out.forall { case (_, s) => s >= 0 && s < 8 })
    val sizes = out.groupBy(_._2).values.map(_.length)
    assert(sizes.min > 350 && sizes.max < 650, s"skewed shards: $sizes")
    val again = Shuffling.shard(ids(4000), "doc_id", numShards = 8, seed = 42L)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(out.toMap == again.toMap, "shard assignment must be stable")
  }

  test("global sort is range-partitioned, not single-task") {
    val plan = Shuffling.deterministicShuffle(ids(100), "doc_id", 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"orderBy must compile to a range-partitioned sort:\n$plan")
  }
}
