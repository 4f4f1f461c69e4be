package graft.examples

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Smoke test for the runnable examples' session-agnostic bodies — the
  * mains wrap these with their own session lifecycle. */
class ExamplesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("PlotTree writes a parseable Graphviz digraph for the fitted tree") {
    val out = java.nio.file.Files.createTempFile("graft_plot_tree", ".dot")
    try {
      val written = PlotTree.run(spark, "/root/testdata/sf0.001", out)
      val dot = java.nio.file.Files.readString(written)
      assert(dot.startsWith("digraph DecisionTree {"))
      assert(dot.trim.endsWith("}"))
      // a depth-3 fit on the 3-class returnflag target must actually split
      assert(dot.contains("Feature: "), "root must be a split node")
      assert(dot.contains("[label=yes]") && dot.contains("[label=no]"))
      // every node line the walker emitted is well-formed: balanced quotes
      dot.linesIterator.filter(_.contains("[label=")).foreach { l =>
        assert(l.count(_ == '"') % 2 == 0, s"unbalanced quotes in: $l")
      }
    } finally java.nio.file.Files.deleteIfExists(out)
  }
}
