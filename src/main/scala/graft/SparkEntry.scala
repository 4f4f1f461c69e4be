package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tree.{Criterion, DecisionTreeClassifier, Predict}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: end-to-end fit + batch predict of the decision tree on
    * sf0.001 lineitem (the reference's core capability), returning the
    * per-class prediction counts (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag")
    val model = DecisionTreeClassifier(maxDepth = Some(2), criterion = Criterion.Entropy,
      maxBins = Some(32)) // level-wise single-pass aggregate scale path
      .fit(df, "l_returnflag")
    Predict.predictMany(model, df).groupBy("prediction").count().orderBy("prediction")
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-pipeline extensions). See [[QueryCatalog]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (xxhash64-based signatures)
    * get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
