package graft.tree

import java.nio.file.Files
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** JSON persistence round-trip (reference pickles: tree.py:41-65). */
class ModelIOSpec extends AnyFunSuite {

  private def roundTrip(m: DecisionTreeModel): DecisionTreeModel = {
    val p = Files.createTempFile("graft_model", ".json")
    ModelIO.save(m, p.toString)
    val loaded = ModelIO.load(p.toString)
    Files.delete(p)
    loaded
  }

  test("int-target model round-trips exactly") {
    val tree = SplitNode("f1", 1.5, 0.4, 0.9, Seq(10L, 5L),
      LeafNode(0),
      SplitNode("f2", -3.25, 0.2, 0.6, Seq(3L, 5L), LeafNode(1), LeafNode(0)))
    val m = DecisionTreeModel(tree, Map("c" -> Map("a" -> 0, "b" -> 1)), IntegerType)
    assert(roundTrip(m) == m)
  }

  test("string-target model round-trips exactly") {
    val tree = SplitNode("petal_width", 0.8, 0.91, 1.58, Seq(50L, 50L, 50L),
      LeafNode("setosa"), LeafNode("virginica"))
    val m = DecisionTreeModel(tree, Map.empty, StringType)
    assert(roundTrip(m) == m)
  }

  test("loaded model scores identically") {
    val tree = SplitNode("x", 2.0, 0.5, 1.0, Seq(4L, 4L), LeafNode("lo"), LeafNode("hi"))
    val m = DecisionTreeModel(tree, Map.empty, StringType)
    val l = roundTrip(m)
    for (v <- Seq(1.0, 2.0, 2.1, 100.0)) {
      assert(Predict.predictRow(l.tree, Map("x" -> v)) == Predict.predictRow(m.tree, Map("x" -> v)))
    }
  }
}
