package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark

/** Property invariants for the deterministic split/shard assignments —
  * the guarantees a training pipeline silently relies on: every row gets
  * exactly one split whatever the weights, and growing a leading split
  * can only ADD rows to it (threshold monotonicity = no train/test
  * leakage across config changes).
  */
class ShufflingPropertiesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private def ids(n: Long) = (1L to n).map(i => (i, s"d$i")).toDF("doc_id", "text")

  test("assignSplit partitions every row for arbitrary normalized weights") {
    val weightsGen: Gen[(Seq[Double], Long)] = for {
      k <- Gen.choose(2, 5)
      raw <- Gen.listOfN(k, Gen.choose(0.05, 1.0))
      seed <- Gen.choose(0L, 500L)
    } yield (raw.map(_ / raw.sum), seed)
    val d = ids(400)
    check(Prop.forAll(weightsGen) { case (ws, seed) =>
      val splits = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
      val out = Shuffling.assignSplit(d, "doc_id", splits, seed)
        .select("doc_id", "split").collect()
      out.length == 400 &&
        out.forall(r => splits.exists(_._1 == r.getString(1)))
    }, minSuccessful = 10)
  }

  test("growing the leading split's weight never removes rows from it") {
    val gen: Gen[(Double, Double, Long)] = for {
      small <- Gen.choose(0.1, 0.6)
      delta <- Gen.choose(0.05, 0.35)
      seed <- Gen.choose(0L, 500L)
    } yield (small, small + delta, seed)
    val d = ids(300)
    check(Prop.forAll(gen) { case (w1, w2, seed) =>
      def train(w: Double) = Shuffling
        .assignSplit(d, "doc_id", Seq("train" -> w, "rest" -> (1.0 - w)), seed)
        .where(col("split") === "train").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      train(w1).subsetOf(train(w2))
    }, minSuccessful = 10)
  }
}
