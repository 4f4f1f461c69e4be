package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the count-based twin of the
  * fastText-style quality/language filters every large-corpus curation
  * pipeline trains on seed sets (Wikipedia-vs-crawl quality gates, per-lang
  * routing; public methodology: McCallum & Nigam 1998, CCNet/GPT-3 data
  * pipelines). Training is PURE integer counting, so the fitted model and
  * every per-document score are exactly replayable by an external SQL
  * engine: log probabilities are quantized once per model cell to
  * `floor(ln(p) * 1e9)` (the [[Scoring.sourceEntropy]] convention) and
  * every downstream rollup is exact integer arithmetic — partitioning
  * cannot perturb a score by even one micro-nat.
  *
  * Scale shape, designed for a 100 TB corpus and a bounded label set:
  *  - [[train]]: ONE tokenize pass over the labeled set feeding one
  *    map-side-combined `(label, token)` count aggregate (the only
  *    corpus-sized shuffle), a TakeOrdered top-`vocabSize` vocabulary cut
  *    (count desc, token asc — deterministic under ties, driver-safe by
  *    the `vocabSize <= 10000` bound), and a dense `labels x vocab` model
  *    grid built from broadcast frames — smoothing denominators ride the
  *    same tiny aggregate, no extra corpus pass.
  *  - [[classify]]: the model is `vocabSize x |labels|` rows — broadcast.
  *    The corpus is scanned ONCE: tokens inner-join the broadcast model
  *    (fan-out = |labels| per known token, a map-side operation), one
  *    map-side-combined `(doc, label)` aggregate sums quantized logs in
  *    DECIMAL(38,0), and the per-doc argmax is a `min(struct(...))`
  *    aggregate — never a global window. Docs with zero in-vocabulary
  *    tokens are kept and fall back to the prior-argmax label, so the
  *    operator never silently drops rows.
  */
object NaiveBayes {

  /** Whitespace tokenization shared with [[Scoring]]'s corpus statistics:
    * lower, trim, split on whitespace runs — `unnest(regexp_split_to_array
    * (trim(lower(text)), '\s+'))` on the SQL side. */
  private def tokens(textCol: Column): Column =
    split(regexp_replace(lower(trim(coalesce(textCol, lit("")))), "\\s+", " "), " ")

  /** The model's feature stream: non-empty unigrams, plus — when
    * `bigramBuckets > 0` — HASHED BIGRAM features (the fastText n-gram
    * hashing trick, Joulin et al. 2016, public): each adjacent token
    * pair hashes through the md5-prefix token hash into one of
    * `bigramBuckets` buckets and surfaces as the synthetic token
    * `bg#<bucket>` alongside the unigrams, so the SAME vocabulary cut,
    * dense grid, and scoring fold carry word-order evidence with a
    * BOUNDED feature space — the hashing caps distinct bigram features
    * at `bigramBuckets` regardless of corpus size, which is what keeps
    * the model grid broadcastable at 100 TB. Bucket ids are
    * md5-replayable in any engine ([[Dedup.md5TokenHash60]] mod
    * buckets; the hash is 60 non-negative bits, so `%` == `pmod`).
    * Shared with the streaming twin so stream == batch stays bit-exact
    * under bigrams too.
    *
    * Namespace guard (r18 ADVICE): in bigram mode a REAL corpus token
    * that happens to look like a bucket id (`bg#7`) would silently merge
    * its unigram counts with bigram bucket 7, so such tokens are escaped
    * to `t#bg#7` in the emitted unigram stream (bigram hashing still
    * sees the raw pair — only the emitted feature name is rewritten, and
    * `t#`-prefixed features can never collide with `bg#` ones). The
    * escape must be INJECTIVE (r19 ADVICE): a real corpus token
    * `t#bg#7` passed through verbatim would collide with the escaped
    * form of real token `bg#7`, merging two distinct tokens one level
    * up — so EVERY token matching `^(t#)*bg#[0-9]+$` gets one more `t#`
    * prepended, making the map a bijection on feature names (each
    * escape level is reachable from exactly one raw token). Unigram
    * mode has no synthetic namespace and emits tokens verbatim. */
  private[graft] def features(textCol: Column, bigramBuckets: Int): Column = {
    val toks = filter(tokens(textCol), t => length(t) > 0)
    if (bigramBuckets <= 0) toks
    else {
      val unigrams = transform(toks, t =>
        when(t.rlike("^(t#)*bg#[0-9]+$"), concat(lit("t#"), t)).otherwise(t))
      val bigrams = transform(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        (t, i) => concat(lit("bg#"),
          pmod(Dedup.md5TokenHash60(concat(t, lit(" "), element_at(toks, i + lit(2)))),
            lit(bigramBuckets.toLong)).cast("string")))
      concat(unigrams, bigrams)
    }
  }

  /** Fit the model: returns the DENSE `labels x vocabulary` grid
    * `(label, token, cnt, logp_q, prior_q)` where
    *  - `cnt` is the exact token count for (label, token) over the
    *    training set (0 for vocabulary tokens the label never saw),
    *  - `logp_q = floor(ln((cnt + 1) / (label_total + vocab_used)) * 1e9)`
    *    is the Laplace-smoothed log-likelihood in integer nano-nats
    *    (`vocab_used` = the ACTUAL vocabulary row count, which may be
    *    smaller than `vocabSize` on small training sets), and
    *  - `prior_q = floor(ln(label_docs / total_docs) * 1e9)` is the
    *    quantized log prior, repeated on each of the label's rows so the
    *    model is a single self-contained frame.
    *
    * The vocabulary is the top `vocabSize` tokens by total training-set
    * count, ties broken token-ascending — a TakeOrdered cut, so the model
    * build never materializes an unbounded vocabulary. */
  def train(
      df: DataFrame,
      labelCol: String,
      textCol: String,
      vocabSize: Int = 2000,
      bigramBuckets: Int = 0
  ): DataFrame = {
    require(vocabSize >= 1 && vocabSize <= 10000,
      s"vocabSize must be in [1, 10000] (TakeOrdered cut + broadcast model stay driver-safe), got $vocabSize")
    require(bigramBuckets >= 0 && bigramBuckets <= 65536,
      s"bigramBuckets must be in [0, 65536], got $bigramBuckets")
    val dec = "decimal(38,0)"
    val tok = df.select(col(labelCol).as("__lbl"),
      explode(features(col(textCol), bigramBuckets)).as("__t"))
    // the one corpus-sized exchange: map-side-combined (label, token) counts
    val tokCounts = tok.groupBy("__lbl", "__t").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // read 2x: vocabulary cut + dense-grid join
    val vocab = tokCounts.groupBy("__t").agg(sum("__c").cast("long").as("__ct"))
      .orderBy(col("__ct").desc, col("__t").asc)
      .limit(vocabSize)
      .select("__t")
    val docTotals = df.groupBy(col(labelCol).as("__lbl"))
      .agg(count(lit(1)).as("__docs"))
    val grand = docTotals.agg(sum("__docs").cast("long").as("__alldocs"))
    // dense labels x vocab grid from broadcast tiny frames; unseen cells = 0
    val dense = broadcast(docTotals).crossJoin(broadcast(vocab))
      .join(tokCounts, Seq("__lbl", "__t"), "left")
      .select(col("__lbl"), col("__t"), col("__docs"),
        coalesce(col("__c"), lit(0L)).cast("long").as("cnt"))
    // smoothing denominators ride one tiny aggregate over the dense grid
    val labelTotals = dense.groupBy("__lbl")
      .agg(sum(col("cnt").cast(dec)).cast("long").as("__tot"),
        count(lit(1)).as("__vused"))
    dense
      .join(broadcast(labelTotals), Seq("__lbl"))
      .crossJoin(broadcast(grand))
      .select(
        col("__lbl").as("label"),
        col("__t").as("token"),
        col("cnt"),
        floor(log((col("cnt") + lit(1)).cast("double")
            / (col("__tot") + col("__vused")).cast("double")) * lit(1e9))
          .cast("long").as("logp_q"),
        floor(log(col("__docs").cast("double") / col("__alldocs").cast("double"))
            * lit(1e9))
          .cast("long").as("prior_q"))
  }

  /** Score a corpus against a fitted model: for each document,
    * `score_q(label) = prior_q + sum over in-vocabulary token OCCURRENCES
    * of logp_q` (integer nano-nats, DECIMAL-summed), and the winner is
    * the max score with ties broken label-ascending. Returns one row per
    * input document: `(id, predicted, score_q, n_known)` where `n_known`
    * counts in-vocabulary token occurrences (0 rows fall back to the
    * prior-argmax label — the no-evidence prediction, never a drop).
    *
    * Out-of-vocabulary tokens contribute to NO label (the same tokens are
    * missing from every label's sum, so the argmax is unaffected by the
    * shared evidence) — the standard restricted-vocabulary NB rule, and
    * the one that keeps the scoring pass a broadcast join instead of an
    * unbounded-vocabulary lookup. */
  def classify(
      df: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      bigramBuckets: Int = 0
  ): DataFrame = {
    val dec = "decimal(38,0)"
    val m = model.select(col("label").as("__lbl"), col("token").as("__t"),
      col("logp_q"), col("prior_q"))
    val tok = df.select(col(idCol),
      explode(features(col(textCol), bigramBuckets)).as("__t"))
    val perLabel = tok
      .join(broadcast(m), Seq("__t"))
      .groupBy(col(idCol), col("__lbl"))
      .agg(
        (first("prior_q").cast(dec) + sum(col("logp_q").cast(dec)))
          .cast("long").as("__score"),
        count(lit(1)).as("__known"))
    val best = perLabel.groupBy(col(idCol))
      .agg(min(struct((-col("__score")).as("n"), col("__lbl").as("l"),
        col("__known").as("k"))).as("__b"))
      .select(col(idCol), col("__b.l").as("__pred"),
        col("__b.n").as("__negscore"), col("__b.k").as("__nknown"))
    // no-evidence fallback: the prior-argmax label, as a 1-row broadcast
    val fallback = model.groupBy("label").agg(first("prior_q").as("__pq"))
      .agg(min(struct((-col("__pq")).as("n"), col("label").as("l"))).as("__f"))
      .select(col("__f.l").as("__fl"), col("__f.n").as("__fn"))
    df.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .crossJoin(broadcast(fallback))
      .select(col(idCol),
        coalesce(col("__pred"), col("__fl")).as("predicted"),
        (-coalesce(col("__negscore"), col("__fn"))).cast("long").as("score_q"),
        coalesce(col("__nknown"), lit(0L)).cast("long").as("n_known"))
  }

  /** Confusion matrix of [[classify]] against the true labels: one row per
    * observed `(actual, predicted)` pair with its count — the eval rollup
    * a filter-training run reads before shipping the model. Bounded at
    * |labels|^2 rows; one map-side-combined aggregate over the classify
    * output. */
  def confusion(
      df: DataFrame,
      model: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      bigramBuckets: Int = 0
  ): DataFrame = {
    val scored = classify(df, model, idCol, textCol, bigramBuckets)
    scored
      .join(df.select(col(idCol), col(labelCol).as("actual")), Seq(idCol))
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
  }
}
