package graft.tree

/** Independent in-memory reference implementation of the reference
  * library's exact tree semantics (reference: efficient_trees/tree.py:180-385),
  * written as straightforward driver-side Scala over collected arrays — no
  * Spark, no shared code with the production pipeline. Serves as the
  * differential oracle for the distributed trainer, in place of the
  * sklearn-iris golden fixture (sklearn/iris data is not available in this
  * offline environment; FIXTURES.md §1 documents the substitution).
  *
  * Semantics mirrored:
  *  - candidate thresholds = distinct observed values of a feature (rows
  *    with null feature dropped per feature), minus the maximum ("at least
  *    one example on the right", tree.py:274-277);
  *  - gain = parent criterion - weighted child criterion over the
  *    feature's non-null rows; entropy log base 2 with 0*log2(0) := 0;
  *    gini = 1 - sum(p^2);
  *  - per-feature tie-break threshold ASC, global tie-break gain DESC,
  *    feature ASC, threshold ASC; stop on depth cap or gain <= 0;
  *  - majority leaf: max count, smallest label on ties.
  *
  * Floating-point expressions keep the same association order as the
  * production column expressions so trees match bitwise on non-tied data.
  */
object RefTree {

  final case class Fitted(tree: TreeNode, targets: Seq[Any])

  private def criterion(counts: Seq[Long], crit: Criterion): Double = {
    val n = counts.sum
    val ps = counts.map(c => if (n == 0) 0.0 else c.toDouble / n.toDouble)
    crit match {
      case Criterion.Entropy =>
        -1.0 * ps.map(p => if (p > 0) p * (math.log(p) / math.log(2.0)) else 0.0).sum
      case Criterion.Gini =>
        1.0 - ps.map(p => p * p).sum
    }
  }

  def fit(
      rows: Seq[Map[String, Option[Double]]],
      ys: Seq[Any],
      features: Seq[String],
      crit: Criterion,
      maxDepth: Int
  ): Fitted = {
    // natural ordering per type, matching the trainer's orderBy(target):
    // a toString sort would order Int targets 0,1,10,2,... for 10+ classes
    val targets = ys.distinct.sortWith {
      case (a: Int, b: Int)       => a < b
      case (a: Long, b: Long)     => a < b
      case (a: Double, b: Double) => a < b
      case (a: String, b: String) => a < b
      case (a, b)                 => a.toString < b.toString
    }
    Fitted(build(rows.zip(ys), features, targets, crit, 0, maxDepth), targets)
  }

  private def classCounts(data: Seq[(Map[String, Option[Double]], Any)], targets: Seq[Any]): Seq[Long] =
    targets.map(t => data.count(_._2 == t).toLong)

  private def majority(data: Seq[(Map[String, Option[Double]], Any)], targets: Seq[Any]): Any = {
    val counts = classCounts(data, targets)
    targets(counts.indexOf(counts.max))
  }

  private def build(
      data: Seq[(Map[String, Option[Double]], Any)],
      features: Seq[String],
      targets: Seq[Any],
      crit: Criterion,
      depth: Int,
      maxDepth: Int
  ): TreeNode = {
    if (depth >= maxDepth) return LeafNode(majority(data, targets))

    // best split per feature, then global best
    val candidates = features.flatMap { f =>
      val present = data.filter(_._1(f).isDefined)
      if (present.isEmpty) None
      else {
        val values = present.map(_._1(f).get).distinct.sorted
        val thresholds = values.dropRight(1)
        val parentCounts = classCounts(present, targets)
        val parentCrit = criterion(parentCounts, crit)
        val n = present.size.toDouble
        val scored = thresholds.map { t =>
          val left = present.filter(_._1(f).get <= t)
          val right = present.filter(_._1(f).get > t)
          val lc = criterion(classCounts(left, targets), crit)
          val rc = criterion(classCounts(right, targets), crit)
          val child = left.size.toDouble / n * lc + right.size.toDouble / n * rc
          (t, parentCrit - child)
        }.filterNot { case (_, g) => g.isNaN }
        if (scored.isEmpty) None
        else {
          val (t, g) = scored.minBy { case (t, g) => (-g, t) }
          Some((f, t, g, parentCrit))
        }
      }
    }
    if (candidates.isEmpty) return LeafNode(majority(data, targets))
    val (f, t, g, pc) = candidates.minBy { case (f, t, g, _) => (-g, f, t) }
    if (g <= 0) return LeafNode(majority(data, targets))

    // null-feature rows leave both children (3-valued logic)
    val left = data.filter(r => r._1(f).exists(_ <= t))
    val right = data.filter(r => r._1(f).exists(_ > t))
    SplitNode(f, t, g, pc, classCounts(data, targets),
      build(left, features, targets, crit, depth + 1, maxDepth),
      build(right, features, targets, crit, depth + 1, maxDepth))
  }

  def predict(tree: TreeNode, row: Map[String, Option[Double]]): Option[Any] = tree match {
    case LeafNode(v) => Some(v)
    case SplitNode(f, t, _, _, _, l, r) =>
      row(f) match {
        case Some(v) if v <= t => predict(l, row)
        case Some(_)           => predict(r, row)
        case None              => None
      }
  }
}
