package graft.operators

import org.apache.spark.sql.functions.col
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

  test("assignSplit: disjoint, exhaustive, reproducible, near the weights") {
    val d = ids(5000)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Shuffling.assignSplit(d, "doc_id", splits, seed = 7L)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.length == 5000, "every row gets exactly one split")
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    assert(math.abs(sizes("train") / 5000.0 - 0.8) < 0.03, s"train drifted: $sizes")
    assert(math.abs(sizes("val") / 5000.0 - 0.1) < 0.02, s"val drifted: $sizes")
    val again = Shuffling.assignSplit(d, "doc_id", splits, seed = 7L)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.toMap == again.toMap, "assignment must be reproducible")
  }

  test("assignSplit: strata split in the same proportions without per-stratum logic") {
    import spark.implicits._
    val d = (1L to 6000L).map(i => (i, if (i % 3 == 0) "de" else "en")).toDF("doc_id", "lang")
    val out = Shuffling.assignSplit(d, "doc_id", Seq("train" -> 0.9, "test" -> 0.1), 3L)
      .select("lang", "split").collect().map(r => r.getString(0) -> r.getString(1))
    val deTrain = out.count(x => x._1 == "de" && x._2 == "train") /
      out.count(_._1 == "de").toDouble
    val enTrain = out.count(x => x._1 == "en" && x._2 == "train") /
      out.count(_._1 == "en").toDouble
    assert(math.abs(deTrain - 0.9) < 0.03 && math.abs(enTrain - 0.9) < 0.03,
      s"stratum proportions drifted: de=$deTrain en=$enTrain")
  }

  test("assignSplit: growing a leading split only ADDS rows to it") {
    val d = ids(3000)
    def trainSet(w: Double) = Shuffling
      .assignSplit(d, "doc_id", Seq("train" -> w, "rest" -> (1.0 - w)), 11L)
      .where(col("split") === "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val small = trainSet(0.5)
    val big = trainSet(0.8)
    assert(small.subsetOf(big), "re-weighting must not swap rows between splits")
  }

  test("assignSplit: null id yields a NULL split, never the last bucket") {
    import spark.implicits._
    val d = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    val out = Shuffling.assignSplit(d, "doc_id", Seq("train" -> 0.5, "test" -> 0.5), 1L)
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) -> r.getString(1))
    assert(out.collect { case (None, s) => s }.head == null,
      "null ids must not be silently dumped into the last split")
    assert(out.collect { case (Some(_), s) => s }.forall(s => s == "train" || s == "test"))
  }

  test("sampleNPerStratum: exact count per stratum, nested across n") {
    import spark.implicits._
    val d = (1L to 900L).map(i => (i, if (i % 3 == 0) "de" else "en")).toDF("doc_id", "lang")
    val small = Shuffling.sampleNPerStratum(d, "doc_id", "lang", n = 10, seed = 5L)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val big = Shuffling.sampleNPerStratum(d, "doc_id", "lang", n = 25, seed = 5L)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(small.count(_._2 == "en") == 10 && small.count(_._2 == "de") == 10,
      "exactly n per stratum")
    assert(big.length == 50)
    assert(small.map(_._1).toSet.subsetOf(big.map(_._1).toSet),
      "top-10 must be a prefix of top-25 (nested sampling)")
    // two-pass equivalence: pre-cut on the SAME seeded hash fraction,
    // then exact rank = direct rank (the fraction cut is a down-set of
    // the hex order), whenever the cut keeps >= n rows per stratum
    val preCut = d.where(Shuffling.hashFraction(col("doc_id"), 5L) < 0.2)
    val twoPass = Shuffling.sampleNPerStratum(preCut, "doc_id", "lang", n = 10, seed = 5L)
      .collect().map(_.getLong(0)).toSet
    assert(twoPass == small.map(_._1).toSet,
      "bounded-window two-pass must reproduce the direct sample exactly")
  }

  test("global sort is range-partitioned, not single-task") {
    val plan = Shuffling.deterministicShuffle(ids(100), "doc_id", 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"orderBy must compile to a range-partitioned sort:\n$plan")
  }

  test("weighted sample: differential vs a Scala replica of the A-ES keys") {
    val d = (1L to 300L).map(i => (i, (i % 17 + 1).toDouble)).toDF("doc_id", "w")
    val out = Shuffling.weightedSampleN(d, "doc_id", "w", n = 25, seed = 9L)
      .collect().map(_.getLong(0)).toSeq
    // replica: same md5-hex8 uniform, same -ln(u)/w key, same (key, id) order
    def key(id: Long, w: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:9".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      -math.log(u) / w
    }
    val expected = (1L to 300L).map(i => (key(i, (i % 17 + 1).toDouble), i))
      .sorted.take(25).map(_._2)
    assert(out == expected, "distributed keys must equal the sequential replica")
  }

  test("weighted sample: nested across n, weight-sensitive, guards bad weights") {
    val d = (1L to 400L).map(i => (i, if (i == 123L) 1e6 else 1.0)).toDF("doc_id", "w")
    val small = Shuffling.weightedSampleN(d, "doc_id", "w", n = 10, seed = 3L)
      .collect().map(_.getLong(0)).toSet
    val big = Shuffling.weightedSampleN(d, "doc_id", "w", n = 40, seed = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "top-10 must nest inside top-40")
    assert(small.contains(123L),
      "a 1e6x weight must dominate a 10-of-400 draw (deterministic for this seed)")
    // zero / negative / null weights never win
    val mixed = Seq((1L, 0.0), (2L, -5.0), (3L, 2.0)).toDF("doc_id", "w")
      .union(Seq((4L, Double.NaN)).toDF("doc_id", "w"))
    val kept = Shuffling.weightedSampleN(mixed, "doc_id", "w", n = 10, seed = 1L)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L), s"only the positive-weight row may survive, got $kept")
  }

  test("weighted sample: the cut is TakeOrderedAndProject, not a global sort") {
    val d = ids(200).withColumn("w", col("doc_id").cast("double"))
    val plan = Shuffling.weightedSampleN(d, "doc_id", "w", n = 5, seed = 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"orderBy.limit must compile to per-partition heaps:\n$plan")
  }
}
