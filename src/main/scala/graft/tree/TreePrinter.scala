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
}
