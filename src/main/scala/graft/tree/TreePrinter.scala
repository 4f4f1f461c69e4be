package graft.tree

/** Text rendering of a fitted tree — the library twin of the reference's
  * matplotlib `plot_tree` helper (reference: examples/utils/utils.py,
  * non-core): one line per node, indented by depth, with the split
  * condition, gain, criterion value, and class distribution.
  */
object TreePrinter {

  def render(model: DecisionTreeModel): String = render(model.tree)

  def render(tree: TreeNode): String = {
    val sb = new StringBuilder
    def walk(node: TreeNode, indent: String, label: String): Unit = node match {
      case LeafNode(v) =>
        sb ++= s"$indent${label}leaf: $v\n"
      case SplitNode(f, thr, gain, crit, dist, l, r) =>
        sb ++= f"$indent$label$f <= $thr%s  [gain=$gain%.6f crit=$crit%.6f n=${dist.sum} dist=${dist.mkString("/")}]%n"
        walk(l, indent + "  ", "yes: ")
        walk(r, indent + "  ", "no:  ")
    }
    walk(tree, "", "")
    sb.result()
  }

  /** Nodes + leaves count, max depth — quick shape summary. */
  def summary(tree: TreeNode): String =
    s"depth=${tree.depth} leaves=${tree.numLeaves}"

  /** Graphviz DOT rendering — the graphical twin of the reference's
    * matplotlib `plot_tree` (reference: examples/utils/utils.py:22-89)
    * without a plotting dependency: split nodes carry the same fields the
    * reference draws (feature, `<= threshold`, criterion value,
    * information gain, target distribution), leaves their value. Pipe the
    * output through `dot -Tpdf` for the reference's PDF artifact. */
  def renderDot(model: DecisionTreeModel): String = renderDot(model.tree)

  def renderDot(tree: TreeNode): String = {
    val sb = new StringBuilder
    sb ++= "digraph DecisionTree {\n  node [shape=box, style=rounded];\n"
    var n = -1
    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def walk(node: TreeNode): Int = {
      n += 1
      val id = n
      node match {
        case LeafNode(v) =>
          sb ++= s"""  n$id [label="Leaf\\nValue: ${esc(String.valueOf(v))}", """ +
            s"""fillcolor=lightblue, style="rounded,filled"];\n"""
        case SplitNode(f, thr, gain, crit, dist, l, r) =>
          sb ++= f"""  n$id [label="Feature: ${esc(f)}\\n<= $thr%.2f""" +
            f"""\\nCriterion value: $crit%.2f\\nInformation Gain: $gain%.2f""" +
            f"""\\nTargets: ${dist.mkString("[", ", ", "]")}", """ +
            f"""fillcolor=lightgreen, style="rounded,filled"];%n"""
          val lId = walk(l)
          sb ++= s"  n$id -> n$lId [label=yes];\n"
          val rId = walk(r)
          sb ++= s"  n$id -> n$rId [label=no];\n"
      }
      id
    }
    walk(tree)
    sb ++= "}\n"
    sb.result()
  }
}
