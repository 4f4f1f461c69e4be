package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.FrequentItemsSketch

/** Bounded-memory frequent-items discovery over text corpora, built on
  * [[graft.functions.FrequentItemsSketch]] (Misra–Gries).
  *
  * Why not `groupBy(item).count.orderBy(desc).limit(k)`: that plan
  * shuffles the ENTIRE item dictionary (every distinct n-gram of a
  * 100 TB crawl) just to keep the top handful. The sketch path is one
  * narrow aggregate — each task keeps a `capacity`-entry summary,
  * partial-merges map-side, and the final merge sees `capacity` rows per
  * partition. No item-keyed shuffle exists in the plan at all
  * (PlanAuditSpec-style: the only exchange is the single-partition
  * final-merge gather).
  *
  * Exactness contract: when the corpus's distinct item count fits in
  * `capacity`, results are exactly `groupBy.count` (emitted `max_err` =
  * 0 — the DuckDB oracle pins this regime). Above capacity, classic MG
  * bounds hold: any item with true count > total/(capacity+1) is
  * retained, counts under-estimate by at most `max_err`.
  */
object HeavyHitters {

  /** Full sketch contents: (item, n, max_err, total), n desc / item asc.
    * `max_err`/`total` are constant columns (summary-level metadata):
    * `n` is exact when `max_err` = 0, else within `max_err` below true. */
  def frequentItems(df: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    val agg = FrequentItemsSketch(ColumnBridge.expression(col(itemCol)), capacity)
    df.select(ColumnBridge.column(agg.toAggregateExpression()).as("sk"))
      .select(explode(col("sk.items")).as("e"), col("sk.max_err").as("max_err"),
        col("sk.total").as("total"))
      .select(col("e.item").as("item"), col("e.n").as("n"), col("max_err"), col("total"))
  }

  /** Top-k items by (approximate) count: (item, n), n desc / item asc. */
  def topK(df: DataFrame, itemCol: String, capacity: Int, k: Int): DataFrame =
    frequentItems(df, itemCol, capacity)
      .select("item", "n")
      .orderBy(col("n").desc, col("item").asc)
      .limit(k)

  /** Per-GROUP top-k frequent items: one Misra–Gries summary per group
    * key (`groupBy(group).agg(sketch)`), then a per-group rank window
    * over the <= capacity retained items. Same exactness contract as
    * [[frequentItems]] per group (max_err = 0 when a group's distinct
    * items fit in capacity); same scale story — the shuffle carries one
    * `capacity`-entry summary per (task, group), never the item
    * dictionary, and the rank window's partitions are capacity-bounded.
    * The per-language / per-source "what dominates this slice" probe.
    * Output: (group, item, n, max_err, rank). */
  def topKPerGroup(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      capacity: Int,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val agg = FrequentItemsSketch(ColumnBridge.expression(col(itemCol)), capacity)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("n").desc, col("item").asc)
    df.groupBy(col(groupCol))
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("sk"))
      .select(col(groupCol), explode(col("sk.items")).as("e"),
        col("sk.max_err").as("max_err"))
      .select(col(groupCol), col("e.item").as("item"), col("e.n").as("n"), col("max_err"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Top-k word n-grams by DOCUMENT frequency (each document counts a
    * gram once — [[Dedup.shingleSet]]'s distinct semantics, the same
    * recipe the Jaccard family shingles with): (gram, df). */
  def hotGrams(
      docs: DataFrame,
      textCol: String,
      n: Int,
      capacity: Int,
      k: Int): DataFrame =
    topK(
      docs.select(explode(Dedup.shingleSet(col(textCol), n)).as("gram")),
      "gram", capacity, k)
      .withColumnRenamed("item", "gram").withColumnRenamed("n", "df")

  /** Stop-gram discovery for [[Dedup.jaccardPairs]]-style inverted
    * indexes: grams whose sketched document frequency reaches `minDf`.
    * MG under-estimates, so a returned gram REALLY is hot (no false
    * positives above the bound); a hot gram can only be missed if its
    * true df <= minDf + max_err — pick `capacity >> total/minDf` to
    * drive max_err below the margin you care about. Collects at most
    * `capacity` rows to the driver (bounded by construction). */
  def stopGrams(
      docs: DataFrame,
      textCol: String,
      n: Int,
      capacity: Int,
      minDf: Long): Seq[String] =
    frequentItems(
      docs.select(explode(Dedup.shingleSet(col(textCol), n)).as("gram")),
      "gram", capacity)
      .where(col("n") >= minDf)
      .select("item")
      .collect().map(_.getString(0)).toSeq
}
