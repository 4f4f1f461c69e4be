package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tree._

/** Runnable analogs of the reference's examples/ directory, driven off the
  * provided testdata (this container has no sklearn/Kaggle data):
  *
  *  - [[IrisLike]]      ~ examples/iris.py: eager in-memory fit/predict
  *  - [[PlotTree]]      ~ examples/utils/utils.py plot_tree: fit + write
  *                        the Graphviz DOT tree artifact
  *  - [[CategoricalCsv]] ~ examples/heart_disease.py: CSV scan + declared
  *                        categorical columns + train/test split
  *  - [[LazyParquet]]   ~ examples/amex_default.py: parquet scan, fill_null,
  *                        dtype shrink, depth-4 streaming-style fit
  *
  * Each prints a small summary and exits 0 on success:
  * `sbt "runMain graft.examples.IrisLike"` etc.
  */
object ExampleSession {
  def make(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def accuracy(scored: DataFrame, targetCol: String): Double = {
    val (hit, n) = scored.select(
      sum(when(col("prediction") === col(targetCol), 1).otherwise(0)).cast("double"),
      count(lit(1)).cast("double")).head() match { case r => (r.getDouble(0), r.getDouble(1)) }
    hit / n
  }
}

/** Eager in-memory demo (reference: examples/iris.py). */
object IrisLike {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.make()
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 300).map { i =>
      val c = i % 3
      (4.5 + c * 0.9 + rnd.nextGaussian() * 0.4,
        1.5 + c * 1.5 + rnd.nextGaussian() * 0.5,
        0.2 + c * 0.7 + rnd.nextGaussian() * 0.2, c)
    }.toDF("sepal_length", "petal_length", "petal_width", "target")
    val (train, test) = Prep.trainTestSplit(df, 0.3)
    val model = DecisionTreeClassifier(maxDepth = Some(4), criterion = Criterion.Entropy)
      .fit(train, "target")
    val acc = ExampleSession.accuracy(Predict.predictMany(model, test), "target")
    println(f"[iris-like] depth=${model.tree.depth} leaves=${model.tree.numLeaves} test-accuracy=$acc%.3f")
    require(acc > 0.8, "sanity: separable classes should score > 0.8")
    spark.stop()
  }
}

/** Tree-plot demo (reference: examples/utils/utils.py plot_tree): fit a
  * small tree and write the Graphviz DOT artifact (plus the ASCII render
  * to stdout) — `dot -Tpdf tree.dot` yields the reference's PDF plot. */
object PlotTree {
  /** Session-agnostic body (smoke-tested by ExamplesSpec): returns the
    * written DOT path. */
  def run(spark: SparkSession, sfDir: String, dotPath: java.nio.file.Path): java.nio.file.Path = {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag")
    val model = DecisionTreeClassifier(maxDepth = Some(3), criterion = Criterion.Entropy)
      .fit(df, "l_returnflag")
    print(TreePrinter.render(model))
    java.nio.file.Files.writeString(dotPath, TreePrinter.renderDot(model))
    println(s"[plot-tree] ${TreePrinter.summary(model.tree)} dot=$dotPath")
    dotPath
  }

  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.make()
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val dotPath = java.nio.file.Paths.get(
      if (args.length > 1) args(1)
      else s"${System.getProperty("java.io.tmpdir")}/graft_example_tree.dot")
    run(spark, sfDir, dotPath)
    spark.stop()
  }
}

/** CSV + categorical-columns demo (reference: examples/heart_disease.py). */
object CategoricalCsv {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.make()
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // CSV round-trip of the orders table stands in for the Kaggle CSV
    val csvDir = s"${System.getProperty("java.io.tmpdir")}/graft_example_orders_csv"
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_totalprice", "o_orderpriority", "o_orderstatus")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(csvDir)
    val df0 = spark.read.option("header", "true").option("inferSchema", "true").csv(csvDir)
    // binary target: is the order fulfilled ('F')
    val df = Prep.fillNull(
      df0.withColumn("fulfilled",
        when(org.apache.spark.sql.functions.col("o_orderstatus") === "F", 1).otherwise(0))
        .drop("o_orderstatus"), 0.0)
    val (train, test) = Prep.trainTestSplit(df, 0.3)
    val model = DecisionTreeClassifier(maxDepth = Some(4),
      categoricalColumns = Seq("o_orderpriority")).fit(train, "fulfilled")
    val acc = ExampleSession.accuracy(Predict.predictMany(model, test), "fulfilled")
    println(f"[categorical-csv] mappings=${model.categoricalMappings("o_orderpriority").size} test-accuracy=$acc%.3f")
    spark.stop()
  }
}

/** Lazy parquet-scan demo at scale settings (reference: examples/amex_default.py). */
object LazyParquet {
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.make()
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val df = Prep.shrinkDtypes(
      Prep.fillNull(
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag"),
        0.0))
    val model = DecisionTreeClassifier(maxDepth = Some(4), criterion = Criterion.Entropy,
      maxBins = Some(32)).fit(df, "l_returnflag")
    val modelPath = s"${System.getProperty("java.io.tmpdir")}/graft_example_model.json"
    model.save(modelPath)
    val reloaded = ModelIO.load(modelPath)
    val dist = Predict.predictMany(reloaded, df).groupBy("prediction").count()
      .orderBy("prediction").collect().map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(" ")
    println(s"[lazy-parquet] depth=${model.tree.depth} saved+reloaded, prediction counts: $dist")
    spark.stop()
  }
}
