package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** RAKE keyphrase extraction (Rose et al. 2010, public) — unsupervised
  * per-document keyphrases for corpus tagging, topic slicing, and
  * retrieval-index enrichment. Candidate phrases are the maximal token
  * runs between stopword/empty delimiters; a word's score is
  * degree/frequency over its document's phrases (degree = summed length
  * of the phrases containing it, multiplicity included — the rake-nltk
  * accounting); a phrase's score is the sum of its words' scores.
  *
  * Determinism contract: scores live as LONG micro-units — word score
  * `(degree * 1e6) div freq`, phrase score an integer SUM of word
  * micros — so there is no floating point anywhere and the DuckDB
  * oracle replays bit for bit (the [[PageRank]] rule).
  *
  * Scale shape: everything is keyed by doc_id — the positional token
  * explode, the ONE per-doc window (running delimiter count = phrase
  * id; partitions are bounded by document length, the
  * [[Sessionize]]-class bound), and the (doc, phrase) / (doc, word)
  * aggregates + their equi-join. No corpus-global state at all, so the
  * operator is embarrassingly doc-parallel at 100 TB; the only
  * exchanges are the doc-keyed hash partitionings.
  */
object Keyphrases {

  /** Top-`topK` phrases per document: `(doc_id, phrase, score_micro,
    * rank)`, rank by (score desc, phrase asc) — a total order, so the
    * cut is deterministic. Duplicate phrase occurrences within a doc
    * contribute multiplicity to the word stats (per RAKE) but emit one
    * output row. Single-word phrases are valid candidates; documents
    * of only stopwords emit nothing. */
  def rake(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopwords: Seq[String] = TextFunctions.DefaultStopwords,
      topK: Int = 3
  ): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = df.select(col(idCol).as("doc_id"),
        posexplode(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"))
          .as(Seq("pos", "tok")))
    val isDelim: Column = col("tok").isin(stopwords: _*) || col("tok") === ""
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val segmented = toks
      .withColumn("phrase_id",
        sum(when(isDelim, 1L).otherwise(0L)).over(byDoc))
      .where(!isDelim)
    val byPhrase = Window.partitionBy("doc_id", "phrase_id")
    val words = segmented
      .withColumn("phrase_len", count(lit(1)).over(byPhrase))
    // per-doc word stats over phrase occurrences, then integer micro score
    val wordScores = words
      .groupBy("doc_id", "tok")
      .agg(sum("phrase_len").as("degree"), count(lit(1)).as("freq"))
      .select(col("doc_id"), col("tok"),
        expr("(degree * 1000000L) div freq").as("word_micro"))
    val phraseText = words
      .groupBy("doc_id", "phrase_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("phrase"))
    val phraseScores = words.select("doc_id", "phrase_id", "tok")
      .join(wordScores, Seq("doc_id", "tok"))
      .groupBy("doc_id", "phrase_id")
      .agg(sum("word_micro").as("score_micro"))
    val ranked = phraseText.join(phraseScores, Seq("doc_id", "phrase_id"))
      .groupBy("doc_id", "phrase")
      .agg(min("score_micro").as("score_micro"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score_micro").desc, col("phrase"))))
      .where(col("rank") <= topK)
    ranked.select("doc_id", "phrase", "score_micro", "rank")
  }
}
