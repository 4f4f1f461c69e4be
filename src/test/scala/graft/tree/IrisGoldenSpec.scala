package graft.tree

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Verbatim port of the reference's golden integration test
  * (reference: tests/integration/test_tree.py:67-102): trains depth-4
  * trees on the embedded sklearn iris fixture ([[IrisGolden]]) across the
  * full 16-case matrix — {int/str target} x {cache on/off, standing in
  * for the lazy/eager axis} x {with/without the cyclic
  * categorical_feature} x {entropy/gini} — and asserts the engine's
  * predictions equal the reference's HARD-CODED lists on both the train
  * and test splits, plus the reference's own
  * `predict == predict_many` differential (test_tree.py:91-95).
  *
  * This closes the parity loop TreeSpec leaves open: TreeSpec's oracle is
  * RefTree (an independent but builder-authored reimplementation); here
  * the oracle is the reference repository's own numbers.
  *
  * The categorical_feature is NOT declared categorical — the reference's
  * test passes no categorical_columns, so it trains as a plain numeric
  * column (test_tree.py:81). Its 1,2,3 cycle restarts at 1 for the test
  * frame because the shared cycle consumed 105 (divisible by 3) train
  * rows first (test_tree.py:32-34).
  */
class IrisGoldenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def frame(idx: Vector[Int], strTarget: Boolean, withCat: Boolean) = {
    val rows = idx.zipWithIndex.map { case (i, pos) =>
      val (sl, sw, pl, pw, c) = IrisGolden.data(i)
      val cat = (pos % 3) + 1
      Row.fromSeq(Seq(sl, sw, pl, pw) ++
        (if (withCat) Seq(cat) else Nil) :+
        (if (strTarget) IrisGolden.labelStr(c) else c))
    }
    val fields =
      IrisGolden.featureNames.map(StructField(_, DoubleType, nullable = false)) ++
        (if (withCat) Seq(StructField("categorical_feature", IntegerType, nullable = false)) else Nil) :+
        StructField("target", if (strTarget) StringType else IntegerType, nullable = false)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), StructType(fields))
  }

  for {
    strTarget <- Seq(false, true)
    cache <- Seq(true, false)
    withCat <- Seq(true, false)
    crit <- Seq(Criterion.Entropy, Criterion.Gini)
  } test(s"iris golden: target=${if (strTarget) "str" else "int"} cache=$cache cat=$withCat ${crit.name}") {
    val train = frame(IrisGolden.trainIdx, strTarget, withCat)
    val test = frame(IrisGolden.testIdx, strTarget, withCat)
    val feats = IrisGolden.featureNames ++ (if (withCat) Seq("categorical_feature") else Nil)

    val model = DecisionTreeClassifier(maxDepth = Some(4), criterion = crit, cacheNodes = cache)
      .fit(train, "target")

    val (goldTrainInt, goldTestInt) = crit match {
      case Criterion.Entropy => (IrisGolden.trainPredictionsEntropy, IrisGolden.testPredictionsEntropy)
      case Criterion.Gini    => (IrisGolden.trainPredictionsGini, IrisGolden.testPredictionsGini)
    }
    def gold(g: Vector[Int]): Vector[Any] =
      if (strTarget) g.map(IrisGolden.labelStr) else g.map(identity[Any])

    for ((df, golden) <- Seq(train -> gold(goldTrainInt), test -> gold(goldTestInt))) {
      val collected = Predict.predictMany(model, df).collect()
      val preds = collected.map(_.getAs[Any]("prediction")).toVector
      assert(preds == golden,
        s"predictions diverge from the reference's golden list (${crit.name})\n" +
          s"got:    $preds\ngolden: $golden")
      // differential: local walker == engine scorer (test_tree.py:91-95)
      collected.foreach { r =>
        val sample = feats.map(f => f -> r.getAs[Any](f)).toMap
        assert(Predict.predictRow(model.tree, sample) == r.getAs[Any]("prediction"))
      }
    }
  }
}
