package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All pure
  * `functions._` expressions (whole-stage codegen, no UDFs), so they run
  * at scan speed and push column pruning to the parquet reader.
  */
object TextFunctions {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric non-space characters — a cheap proxy for subword
    * tokenizer counts. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  private val punctPattern = "[^.,!?;:]"

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, punctPattern, "")).cast("double") / length(text))

  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Whole-token regex hit count: matches any of `words` appearing as a
    * complete whitespace-delimited token of the space-padded lowered text.
    * Equivalent to `size(filter(split(lower(trim(text)), "\\s+"),
    * _.isInCollection(words)))` but stays inside whole-stage codegen —
    * higher-order-function lambdas run interpreted and dominated the text
    * path (measured 4-6x inflation in long-lived JVMs as interpreted
    * expression call sites go megamorphic). */
  private def tokenHitCount(text: Column, words: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(trim(text)), lit(" "))
    val pat = "(?<=\\s)(?:" +
      words.map(java.util.regex.Pattern.quote).mkString("|") + ")(?=\\s)"
    size(regexp_extract_all(padded, lit(pat), lit(0)))
  }

  /** Ratio of stopword tokens to all tokens. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = DefaultStopwords): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) === 0, lit(0.0))
      .otherwise(tokenHitCount(text, stopwords).cast("double") / size(toks))
  }

  /** Mean token length in characters: total non-whitespace chars / token
    * count — same value as summing per-token lengths, without the
    * interpreted `aggregate` lambda. */
  def meanWordLength(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val nonWs = length(regexp_replace(trim(text), "\\s+", ""))
    when(size(toks) === 0, lit(0.0))
      .otherwise(nonWs.cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punctuation density and a sane stopword ratio. Deterministic, cheap,
    * and monotone in each component — intended as a filterable column, not
    * a model. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * lit(5.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    round((lenScore + punctScore + stopScore) / lit(3.0), 6)
  }

  /** Stopword vocabularies for the n-gram/stopword-hit language heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "y", "es", "las")
  )

  /** Heuristic language ID: count marker-stopword hits per language over
    * the token stream, pick the argmax (fixed priority order on ties,
    * 'und' = undetermined when nothing matches).
    *
    * Single regex pass: ONE combined whole-token alternation over all
    * languages' markers extracts the hit tokens (the r3 per-language
    * version ran 4 separate regex passes over the full text — 2.6x the
    * baseline); per-language counts then filter the extracted hits, a
    * tiny array (a few entries per doc), where the interpreted HOF lambda
    * costs nothing. Marker vocabularies are disjoint across languages, so
    * each hit counts toward exactly one language; whole-token lookarounds
    * make alternation order irrelevant. Identical counts to the
    * per-language regexes (the DuckDB lang_id oracle pins this). */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(trim(text)), lit(" "))
    val allPat = "(?<=\\s)(?:" +
      LangMarkers.flatMap(_._2).distinct.map(java.util.regex.Pattern.quote).mkString("|") +
      ")(?=\\s)"
    val hits = regexp_extract_all(padded, lit(allPat), lit(0))
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(hits, t => t.isInCollection(markers)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, lit("und"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Fraction of repeated tokens: 1 - |distinct tokens| / |tokens| — the
    * word-level repetition signal from published web-corpus quality
    * filters (high values mark boilerplate/spam). 0 for empty text. */
  def dupTokenFraction(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(length(trim(text)) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Fraction of repeated lines: 1 - |distinct lines| / |lines| — the
    * duplicate-line signal (navigation chrome, repeated headers). Single-
    * line documents score 0 by construction. */
  def dupLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    when(length(text) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines))
  }

  /** Ratio of "symbol" characters — anything outside letters, digits,
    * whitespace, and basic punctuation — to total characters. High values
    * mark markup/code/emoji-heavy text. */
  def symbolRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(text, "[A-Za-z0-9\\s.,!?;:'\"()-]", "")).cast("double") /
          length(text))

  // Lookaround-free on purpose: these run verbatim in RE2-based engines
  // (the DuckDB oracle), unlike the java-regex lookbehinds in langId.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val LongDigitRunPattern = "[0-9]{6,}"

  /** All URLs in the text, in order ([[UrlPattern]], RE2-safe) — the
    * extraction half of domain-level curation: web corpora are
    * filtered/weighted by registered domain, and the per-domain rollup
    * (one explode + one domain-keyed aggregate) is how those domain
    * lists get built. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  /** The host part of a URL, lowercased (`https?://HOST/...`); empty
    * string when the input is not a URL. */
  def urlDomain(url: Column): Column =
    lower(regexp_extract(url, "https?://([^/\\s]+)", 1))

  /** PII scrubbing: replace emails, URLs, and long digit runs (phone/ID
    * numbers) with typed placeholder tokens. Order matters — emails and
    * URLs are rewritten before the digit-run pass so their digits can't be
    * partially scrubbed into mixed garbage. Pure regexp_replace chain:
    * whole-stage codegen, runs at scan speed. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        UrlPattern, "<URL>"),
      LongDigitRunPattern, "<NUM>")

  /** Shannon entropy of the document's TOKEN distribution in nats —
    * the lexical-diversity quality signal (low entropy = repetitive
    * boilerplate/spam, high = diverse prose; a standard pretraining
    * filter axis alongside [[dupTokenFraction]]). Computed as
    * `ln(n) - (sum over distinct tokens of c*ln(c)) / n` with integer
    * counts, folding over the SORTED distinct-token array so the
    * per-row sum order is deterministic and the DuckDB twin replays the
    * identical left-to-right fold (the DSIR in-row determinism rule);
    * round(6) absorbs the engines' last-ulp `ln` differences. Cost is
    * O(distinct x tokens) per row — in-row, shuffle-free, fine at the
    * ~100-token documents this filters; empty text scores 0. */
  def tokenEntropy(text: Column): Column = {
    val tk = split(regexp_replace(trim(lower(text)), "\\s+", " "), " ")
    val n = size(tk).cast("double")
    // ONE O(n log n) pass: sort, then fold run lengths — each run's
    // c*ln(c) flushes in ascending-token order, the SAME addition
    // sequence as a sorted-distinct sum, so the DuckDB twin (which
    // list_reduces over sorted distinct tokens) stays bit-identical.
    // (The naive filter-per-distinct-token fold re-evaluated the split
    // inside every lambda call — O(distinct x n) regexes per row, 6.7 s
    // vs 0.6 s on the sf0.1 bench corpus.)
    def flush(acc: Column): Column =
      when(acc.getField("c") > 0L,
        acc.getField("c").cast("double") * log(acc.getField("c").cast("double")))
        .otherwise(lit(0.0))
    val folded = aggregate(
      array_sort(tk),
      struct(lit(0.0).as("s"), lit("").as("prev"), lit(0L).as("c")),
      (acc: Column, t: Column) => struct(
        when(t === acc.getField("prev"), acc.getField("s"))
          .otherwise(acc.getField("s") + flush(acc)).as("s"),
        t.as("prev"),
        when(t === acc.getField("prev"), acc.getField("c") + 1L)
          .otherwise(lit(1L)).as("c")),
      (acc: Column) => acc.getField("s") + flush(acc))
    when(length(trim(text)) === 0, lit(0.0))
      .otherwise(round(log(n) - folded / n, 6))
  }

  /** Content-PRESERVING normalization (the CCNet-style cleanup pass a
    * crawl runs before any scoring): strip C0/DEL control characters
    * (keeping \t \n \r only long enough for the next step to fold
    * them), collapse every whitespace run to a single space, trim.
    * Unlike [[fingerprint]] this keeps case and punctuation — it is a
    * text REWRITE stage, not a dedup key. Pure regexp_replace chain:
    * whole-stage codegen, RE2-compatible (no lookaround), exact DuckDB
    * twin. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " "))

  /** Normalized-content fingerprint: lowercase, strip non-alphanumerics
    * (keeping spaces), collapse whitespace, md5. Collisions across
    * formatting variants of the same content collapse to one fingerprint —
    * the cheap exact-after-normalization dedup key. */
  def fingerprint(text: Column): Column =
    md5(
      trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))
        .cast("binary"))

  /** Hashing-trick document vector (feature hashing with sign correction,
    * Weinberger et al. 2009): each token lands in `hash(token) mod dim`
    * with a ±1 sign drawn from an independent hash bit, so the corpus
    * gets a `dim`-dimensional embedding WITHOUT an external encoder —
    * the self-contained entry point into the whole embedding machinery
    * (near-dup LSH, kNN graphs, communities, ANN indexes). Components
    * are exact signed token counts (integers as doubles), deliberately
    * UN-normalized: cosine is scale-invariant and raw counts replay
    * exactly in any engine.
    *
    * Pure in-row fold over the token array — a projection at scan speed
    * with NO shuffle (the explode/groupBy shape would shuffle
    * tokens x corpus); per-token cost is O(dim), so keep `dim` in the
    * tens-to-hundreds (64 matches the testdata embedding width).
    * `hash` defaults to `xxhash64`; pass [[graft.operators.Dedup.md5TokenHash60]]
    * for cross-engine replay.
    *
    * MATERIALIZE before feeding expression-expanding consumers: LSH
    * signatures and similar operators substitute their input column
    * expression into every plane projection, which would re-run this
    * fold ~2·nBits times per row. Compute once
    * (`localCheckpoint`/persist — the production "embed once, index
    * many" shape), then index. */
  def hashedVector(
      text: Column,
      dim: Int,
      hash: Column => Column = c => xxhash64(c)
  ): Column = {
    require(dim >= 2 && dim <= 4096,
      s"hashedVector dim must be in [2, 4096] (O(dim) per-token in-row cost), got $dim")
    val toks = filter(
      split(regexp_replace(lower(trim(coalesce(text, lit("")))), "\\s+", " "), " "),
      t => length(t) > lit(0))
    // hash each token ONCE into (bucket, sign) BEFORE the scatter-add:
    // keeping the hashing in Catalyst expressions keeps the `hash`
    // parameter pluggable (xxhash64 vs md5TokenHash60 cross-engine replay)
    val keyed = transform(toks, tok => struct(
      pmod(hash(tok), lit(dim.toLong)).cast("int").as("b"),
      when(pmod(hash(concat(tok, lit("#sgn"))), lit(2L)) === 0, lit(1.0d))
        .otherwise(lit(-1.0d)).as("s")))
    // Dense accumulation is a native codegen expression, NOT a Catalyst
    // `aggregate` fold: higher-order functions are interpreted, and the
    // fold's lambda re-evaluated a `when` over ALL `dim` accumulator
    // slots — plus a fresh dim-element array allocation — per token, an
    // O(tokens x dim) interpreted inner loop per row. ScatterAddVector
    // is the same left-to-right out(b) += s (bit-identical FP order,
    // branch-for-branch null parity — see its scaladoc) in one
    // O(tokens) loop inside whole-stage codegen.
    org.apache.spark.sql.graft.ColumnBridge.column(
      ScatterAddVector(
        org.apache.spark.sql.graft.ColumnBridge.expression(keyed), dim))
  }
}
