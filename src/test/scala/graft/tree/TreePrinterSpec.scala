package graft.tree

import org.scalatest.funsuite.AnyFunSuite

class TreePrinterSpec extends AnyFunSuite {

  private val tree: TreeNode =
    SplitNode("petal width (cm)", 0.8, 0.92, 1.58, Seq(31L, 37L, 37L),
      LeafNode(0),
      SplitNode("petal length (cm)", 4.75, 0.69, 1.0, Seq(0L, 37L, 37L),
        LeafNode("versi\"color"), LeafNode(2)))

  test("text render: one line per node, yes/no branches, distribution") {
    val txt = TreePrinter.render(tree)
    assert(txt.linesIterator.size == 5)
    assert(txt.contains("petal width (cm) <= 0.8"))
    assert(txt.contains("yes: leaf: 0"))
    assert(txt.contains("dist=31/37/37"))
  }

  test("DOT render: valid digraph, reference plot_tree fields, escaped labels") {
    val dot = TreePrinter.renderDot(tree)
    assert(dot.startsWith("digraph DecisionTree {"))
    assert(dot.trim.endsWith("}"))
    // the fields the reference's plot draws (utils.py:66-75)
    assert(dot.contains("Feature: petal width (cm)"))
    assert(dot.contains("<= 0.80"))
    assert(dot.contains("Criterion value: 1.58"))
    assert(dot.contains("Information Gain: 0.92"))
    assert(dot.contains("Targets: [31, 37, 37]"))
    assert(dot.contains("Leaf\\nValue: 0"))
    // quotes inside leaf values must be escaped for DOT validity
    assert(dot.contains("versi\\\"color"))
    // 5 nodes, 4 edges with yes/no labels
    assert((0 to 4).forall(i => dot.contains(s"n$i [label=")))
    assert(dot.sliding(4).count(_ == "-> n") == 4)
    assert(dot.contains("[label=yes]") && dot.contains("[label=no]"))
  }
}
