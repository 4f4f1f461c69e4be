package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — the classic
  * keyword-extraction / relevance signal a curation pipeline uses for
  * topic filtering and near-boilerplate detection.
  *
  * Dataflow is inverted-index shaped and shuffle-bounded, never per-pair:
  * tokenize once, aggregate term frequency per (doc, term) — map-side
  * combined, shuffle volume = distinct (doc, term) pairs — then document
  * frequency per term over the TF table (one row per term), join back,
  * score, and take the per-doc top-k with a window. The corpus size N
  * stays IN the plan: a one-row countDistinct aggregate broadcast onto
  * the scored terms (the same scalar-totals-as-broadcast pattern as the
  * split search's cum-count offsets), so building the operator runs no
  * job and composing it lazily costs no eager corpus pass — at 100 TB an
  * eager `distinct().count()` at construction would be a full extra scan
  * before the query even starts.
  *
  * Smoothed idf = ln((N + 1) / (df + 1)) + 1 (the standard smooth variant:
  * never zero, never divides by zero), score = tf * idf. Ties rank by term
  * ascending so results are deterministic and oracle-checkable.
  */
object Tfidf {

  def topTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minDf: Long = 1L
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val corpusN = df.agg(countDistinct(col(idCol)).as("__n"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df") >= lit(minDf))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(corpusN))
      .withColumn("tfidf",
        col("tf") * (log((col("__n") + lit(1)).cast("double") / (col("df") + lit(1))) + lit(1.0)))
    val w = Window.partitionBy("id").orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  /** Corpus vocabulary: the `topK` most frequent terms with their total
    * count and document frequency — the table a tokenizer trainer or
    * stopword/boilerplate analysis reads first.
    *
    * Same inverted shape as [[topTerms]]: per-(doc, term) counts with
    * map-side combine bound the first shuffle by distinct (doc, term)
    * pairs, the term rollup's shuffle is one row per term, and the
    * global top-k compiles to TakeOrderedAndProject (per-partition
    * heaps, no full sort). Ties rank by term ascending so the cut is
    * deterministic and oracle-checkable. */
  def vocabulary(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int,
      minCount: Long = 1L
  ): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = df.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    tf.groupBy("term")
      .agg(sum(col("tf")).as("term_count"), count(lit(1)).as("doc_freq"))
      .where(col("term_count") >= lit(minCount))
      .orderBy(col("term_count").desc, col("term").asc)
      .limit(topK)
  }
}
