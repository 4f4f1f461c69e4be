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

  /** BM25 ranked retrieval (Robertson & Zaragoza 2009, the Okapi/Lucene
    * form) — score a small query batch against the corpus and return each
    * query's top-k documents. This is the lexical-retrieval complement of
    * the embedding ANN family: the same "find the documents most relevant
    * to this probe" primitive, over terms instead of vectors, used for
    * targeted corpus slicing and retrieval-quality evaluation.
    *
    *   idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   score(q, d)   = sum over matched query terms of
    *                   idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    *
    * Query term frequency is collapsed to the distinct term set (the
    * standard short-query simplification; repeat a term in `queries` and
    * it still counts once).
    *
    * Scale shape (the [[Decontamination]] discipline): the query side is
    * MBs against a 100 TB corpus, so its distinct (query, term) set
    * `broadcast()`s onto the per-(doc, term) TF table — the corpus never
    * shuffles for the match, and everything downstream of the broadcast
    * hash join is bounded by MATCHED rows, not corpus rows. TF and
    * per-doc length are map-side-combined aggregates (shuffle volume =
    * distinct (doc, term) pairs); document frequency is computed over the
    * match-restricted TF table only (one row per query term, exact — df
    * counts corpus docs containing the term, and restricting to query
    * terms first drops no such doc); N and avgdl ride a one-row broadcast
    * (the scalar-totals pattern). The per-(query, doc) double folds in
    * TERM-SORTED order inside the row (the DSIR rule), so the score is
    * partitioning-independent bit-for-bit and a SQL twin replays it with
    * `sum(s ORDER BY term)`. The final cut is a per-query top-k window
    * over candidate rows (bounded by matches), never the corpus.
    *
    * `maxDf` is the hot-term guard (the jaccard family's stop-gram cap
    * applied to retrieval): a query term present in more than `maxDf`
    * documents matches a corpus-sized candidate set while contributing
    * near-zero idf — at crawl scale one stopword in a query would
    * otherwise turn the bounded-candidate plan into a full-corpus
    * scoring pass. Capped terms drop from scoring entirely (they do not
    * count toward `n_terms`). */
  def bm25TopK(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      maxDf: Option[Long] = None
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"need k1 >= 0 and b in [0,1], got k1=$k1 b=$b")
    def tokens(df: DataFrame, id: String, text: String): DataFrame =
      df.select(col(id), explode(split(lower(trim(col(text))), "\\s+")).as("term"))
        .where(length(col("term")) > 0)
    val tf = tokens(corpus, idCol, textCol)
      .groupBy(col(idCol).as("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // N + avgdl in one row; derived from the dl table so the whole
    // operator tokenizes the corpus exactly once.
    val stats = dl.agg(count(lit(1)).as("__n"),
      (sum("dl").cast("double") / count(lit(1))).as("__avgdl"))
    val qterms = tokens(queries, queryIdCol, queryTextCol)
      .select(col(queryIdCol).as("query_id"), col("term")).distinct()
    val matched = tf.join(broadcast(qterms), Seq("term"))
    // matched is one row per (doc, term, QUERY) — a term shared by two
    // queries appears twice per doc, so df must dedup on (term, doc)
    // first or shared terms get a multiplied document frequency
    val dfreq0 = matched.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val dfreq = maxDf.fold(dfreq0)(cap => dfreq0.where(col("df") <= cap))
    val scored = matched
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("__s",
        col("__idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl"))))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"),
        aggregate(
          array_sort(collect_list(struct(col("term"), col("__s")))),
          lit(0.0), (acc, x) => acc + x.getField("__s")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    perDoc.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Keyword-in-context snippets for retrieval hits: for each
    * `(query_id, doc_id)` pair in `hits`, the token window of
    * `windowTokens` before/after the FIRST occurrence of any query term
    * in the document — the search-serving highlight step after
    * [[bm25TopK]]/[[bm25TopKOnIndex]] (or any hit list with the same
    * two columns).
    *
    * Fully in-plan per hit row: the document tokenizes once, the first
    * matching position is an index-lambda scan over the token array
    * (`array_min` over per-position matches — no explode, no shuffle
    * beyond the two hit-keyed equi-joins), and the snippet is a slice
    * around it. Hits whose document no longer contains any query term
    * (e.g. a stale hit list) emit a null position and snippet rather
    * than dropping. Output: `(query_id, doc_id, first_pos, snippet)`
    * with `first_pos` 1-based. */
  def snippets(
      hits: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      windowTokens: Int = 3
  ): DataFrame = {
    require(windowTokens >= 0, s"windowTokens must be >= 0, got $windowTokens")
    val docs = corpus.select(col(idCol).as("doc_id"),
      split(lower(trim(col(textCol))), "\\s+").as("__toks"))
    val qs = queries.select(col(queryIdCol).as("query_id"),
      array_distinct(split(lower(trim(col(queryTextCol))), "\\s+")).as("__qt"))
    val n = size(col("__toks"))
    val pos = array_min(transform(sequence(lit(1), n),
      i => when(array_contains(col("__qt"), element_at(col("__toks"), i)), i)))
    val begin = greatest(lit(1), col("first_pos") - windowTokens)
    val len = least(n, col("first_pos") + windowTokens) - begin + 1
    hits.select("query_id", "doc_id")
      .join(docs, Seq("doc_id"))
      .join(broadcast(qs), Seq("query_id"))
      .withColumn("first_pos", pos)
      .withColumn("snippet",
        when(col("first_pos").isNotNull,
          concat_ws(" ", slice(col("__toks"), begin, len))))
      .select("query_id", "doc_id", "first_pos", "snippet")
  }

  /** Frozen BM25 index tables: per-(doc, term) TF, per-term document
    * frequency, per-doc length, and the one-row (N, avgdl) stats —
    * the serving-side artifact. At scale persist each (tf bucketed by
    * `term` — the probe key — via IndexStore) so query batches and the
    * streaming probe ([[graft.streaming.StreamOps.bm25Probe]]) join a
    * columnar read-back instead of re-tokenizing the corpus. */
  final case class Bm25Index(tf: DataFrame, df: DataFrame, dl: DataFrame, stats: DataFrame)

  /** BM25 top-k against a PREBUILT [[Bm25Index]] — the serving path:
    * the corpus is never re-tokenized; the probe joins the persisted tf
    * table (bucketed by `term` via IndexStore, the join key — so the
    * candidate equi-join plans a probe-side-only exchange, the
    * batch_ann_topk_bucketed discipline applied to lexical retrieval).
    * Identical arithmetic and fold order to [[bm25TopK]] — the full-
    * dictionary df table carries the same values for the matched terms
    * as the match-restricted one, so results are bit-identical.
    *
    * Unlike the ad-hoc scorer (whose `maxDf` can only drop capped terms
    * AFTER the match), here the document frequency is known BEFORE the
    * probe, so `maxDf` prunes hot query terms ahead of the candidate
    * join — one stopword in a query can no longer turn the bounded
    * probe into a corpus-sized scoring pass. */
  def bm25TopKOnIndex(
      index: Bm25Index,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      maxDf: Option[Long] = None
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dfKept = maxDf.fold(index.df)(cap => index.df.where(col("df") <= cap))
    val qterms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(split(lower(trim(col(queryTextCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .select("query_id", "term").distinct()
      .join(dfKept.select("term"), Seq("term"), "left_semi")
    val scored = index.tf.join(broadcast(qterms), Seq("term"))
      .join(dfKept, Seq("term"))
      .join(index.dl, Seq("doc_id"))
      .crossJoin(broadcast(index.stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("__s",
        col("__idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl"))))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"),
        aggregate(
          array_sort(collect_list(struct(col("term"), col("__s")))),
          lit(0.0), (acc, x) => acc + x.getField("__s")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    perDoc.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Build [[Bm25Index]] from a corpus — one tokenize pass, three
    * map-side-combined aggregates (tf; df over tf, one row per term; dl
    * over tf, one row per doc) and the one-row stats fold. */
  /** Merge an ingest batch into a standing [[Bm25Index]] WITHOUT
    * re-tokenizing the corpus — the incremental-ingest path (the
    * jaccard `shingleIndex` discipline applied to retrieval): the batch
    * tokenizes once into its own increment, tf/dl append (document sets
    * must be disjoint — same contract as every incremental dedup
    * ingest), df adds term-keyed, and the one-row stats fold recomputes
    * from the merged per-doc lengths (corpus-linear scan of 1-row-per-
    * doc, never the text). The result is structurally IDENTICAL to
    * rebuilding from the concatenated corpus (spec pins probe
    * bit-identity), so merges compose associatively across epochs. */
  def bm25IndexMerge(
      standing: Bm25Index,
      newDocs: DataFrame,
      idCol: String,
      textCol: String
  ): Bm25Index = {
    val inc = bm25Index(newDocs, idCol, textCol)
    val tf = standing.tf.unionByName(inc.tf)
    val df = standing.df.unionByName(inc.df)
      .groupBy("term").agg(sum("df").as("df"))
    val dl = standing.dl.unionByName(inc.dl)
    val stats = dl.agg(count(lit(1)).as("__n"),
      (sum("dl").cast("double") / count(lit(1))).as("__avgdl"))
    Bm25Index(tf, df, dl, stats)
  }

  def bm25Index(corpus: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val tf = corpus
      .select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col(idCol).as("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("__n"),
      (sum("dl").cast("double") / count(lit(1))).as("__avgdl"))
    Bm25Index(tf, df, dl, stats)
  }
}
