package graft.tree

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark

/** Property-based invariants from SURVEY.md §5's rebuild test plan:
  * gain > 0 at every chosen split, children partition the parent
  * (counts sum), entropy ∈ [0, log2 k], gini ∈ [0, 1-1/k], and the
  * chosen split's gain is maximal over the feature's candidate set
  * (cross-checked against the RefTree brute force).
  */
class TreePropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }


  private lazy val spark = TestSpark.spark

  private val datasetGen: Gen[(Seq[(Double, Double, Int)], Long)] = for {
    seed <- Gen.choose(0L, 10000L)
    n <- Gen.choose(30, 120)
  } yield {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { _ =>
      val c = rnd.nextInt(3)
      (math.rint((c + rnd.nextGaussian()) * 4) / 4.0,
        math.rint((2 - c + rnd.nextGaussian()) * 4) / 4.0, c)
    }
    (rows, seed)
  }

  private def toDf(rows: Seq[(Double, Double, Int)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b, c) => Row(a, b, c) }, 2),
      StructType(Seq(StructField("f1", DoubleType), StructField("f2", DoubleType),
        StructField("target", IntegerType))))

  private def splits(t: TreeNode): Seq[SplitNode] = t match {
    case s: SplitNode => s +: (splits(s.left) ++ splits(s.right))
    case _            => Nil
  }

  test("trained trees satisfy the structural invariants on random datasets") {
    check(Prop.forAllNoShrink(datasetGen) { case (rows, seed) =>
      val df = toDf(rows)
      val crit = if (seed % 2 == 0) Criterion.Entropy else Criterion.Gini
      val model = DecisionTreeClassifier(maxDepth = Some(3), criterion = crit).fit(df, "target")
      val k = rows.map(_._3).distinct.size
      val maxCrit = crit match {
        case Criterion.Entropy => math.log(k.toDouble) / math.log(2.0) + 1e-9
        case Criterion.Gini    => 1.0 - 1.0 / k + 1e-9
      }
      val all = splits(model.tree)
      val gainsPositive = all.forall(_.informationGain > 0)
      val critBounded = all.forall(s => s.criterionValue >= -1e-9 && s.criterionValue <= maxCrit)
      // children partition the parent: each split's distribution equals the
      // sum of its children's node counts (null-free data)
      val partitions = all.forall { s =>
        (s.left, s.right) match {
          // leaf distributions aren't stored in the model, so the check
          // only applies when both children are splits (null-free data:
          // the children must partition the parent exactly)
          case (l: SplitNode, r: SplitNode) =>
            l.targetDistribution.sum + r.targetDistribution.sum == s.targetDistribution.sum
          case _ => true
        }
      }
      val depthOk = model.tree.depth <= 3
      gainsPositive && critBounded && partitions && depthOk
    }, minSuccessful = 12)
  }

  test("root split agrees with the RefTree brute-force argmax") {
    check(Prop.forAllNoShrink(datasetGen) { case (rows, seed) =>
      val df = toDf(rows)
      val crit = if (seed % 2 == 0) Criterion.Entropy else Criterion.Gini
      val targets = rows.map(_._3).distinct.sorted.map(_.asInstanceOf[Any])
      val engine = SplitSearch.searchWithStats(df, Seq("f1", "f2"), "target", targets, crit)
      val ref = RefTree.fit(
        rows.map { case (a, b, _) => Map("f1" -> Option(a), "f2" -> Option(b)) },
        rows.map(_._3), Seq("f1", "f2"), crit, maxDepth = 1)
      (engine.best, ref.tree) match {
        case (Some(cs), s: SplitNode) =>
          cs.candidate.feature == s.feature && cs.candidate.threshold == s.threshold
        case (None, _: LeafNode) => true
        case (Some(cs), _: LeafNode) =>
          // engine found a candidate but ref stopped: only valid if gain <= 0
          cs.candidate.informationGain <= 0
        case (None, _: SplitNode) => false
      }
    }, minSuccessful = 12)
  }

  test("shrinkDtype fit == unshrunk fit on f32-pre-rounded data (reference tree.py:90 parity)") {
    // 0.1-grid values are NOT f32-exact (1.9f != 1.9d) — the case the
    // reference's shrink_dtype semantics actually bite on (IrisGoldenSpec)
    check(Prop.forAllNoShrink(datasetGen) { case (rows, seed) =>
      val tenths = rows.map { case (a, b, c) =>
        (math.rint(a * 10) / 10.0, math.rint(b * 10) / 10.0, c) }
      val rounded = tenths.map { case (a, b, c) => (a.toFloat.toDouble, b.toFloat.toDouble, c) }
      val crit = if (seed % 2 == 0) Criterion.Entropy else Criterion.Gini
      val viaShrink = DecisionTreeClassifier(maxDepth = Some(3), criterion = crit)
        .fit(toDf(tenths), "target")
      val viaPreRound = DecisionTreeClassifier(maxDepth = Some(3), criterion = crit,
        shrinkDtype = false).fit(toDf(rounded), "target")
      viaShrink.tree == viaPreRound.tree
    }, minSuccessful = 6)
  }

  test("TreePrinter renders every node once") {
    val df = toDf((0 until 90).map { i =>
      val c = i % 3
      (c * 2.0 + (i % 7) * 0.1, 5.0 - c + (i % 5) * 0.1, c)
    })
    val model = DecisionTreeClassifier(maxDepth = Some(3)).fit(df, "target")
    val out = TreePrinter.render(model)
    assert(out.linesIterator.size == splits(model.tree).size + model.tree.numLeaves)
    assert(TreePrinter.summary(model.tree).startsWith(s"depth=${model.tree.depth}"))
  }
}
