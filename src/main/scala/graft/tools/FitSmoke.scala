package graft.tools

import org.apache.spark.sql.SparkSession
import graft.tree._

/** Dev smoke runner for the trainer: exact vs maxBins fits on testdata
  * lineitem, plus a predictRow-vs-predictMany differential. */
object FitSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag")

    def show(node: TreeNode, indent: String = ""): String = node match {
      case LeafNode(v) => s"${indent}leaf=$v\n"
      case SplitNode(f, t, g, c, dist, l, r) =>
        f"${indent}$f <= $t%.4f gain=$g%.6f crit=$c%.6f dist=${dist.mkString(",")}\n" +
          show(l, indent + "  ") + show(r, indent + "  ")
    }

    for ((label, bins) <- Seq("exact" -> None, "bins32" -> Some(32))) {
      val t0 = System.nanoTime()
      val model = DecisionTreeClassifier(maxDepth = Some(3), criterion = Criterion.Entropy,
        maxBins = bins).fit(df, "l_returnflag")
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[fitsmoke] $label fit ${secs}%.1fs depth=${model.tree.depth} leaves=${model.tree.numLeaves}")
      print(show(model.tree))
      // differential: local walker vs expression scorer on 200 rows
      val sample = df.limit(200)
      val cols = df.columns.filterNot(_ == "l_returnflag")
      val preds = Predict.predictMany(model, sample).select("prediction").collect().map(_.get(0))
      val rows = sample.collect()
      val local = rows.map { r =>
        Predict.predictRow(model.tree, cols.map(c => c -> r.getAs[Any](c)).toMap)
      }
      val mismatches = preds.zip(local).count { case (a, b) => a != b }
      println(s"[fitsmoke] $label differential mismatches=$mismatches/200")
    }
    spark.stop()
  }
}
