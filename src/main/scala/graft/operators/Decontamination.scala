package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set, so eval leakage is removed
  * before training (the GPT-3 appendix-C / PaLM "dirty if it collides with
  * the eval set on enough n-grams" procedure — public methodology).
  *
  * Scale shape, designed for a 100 TB corpus vs a megabyte-scale eval set:
  * the BENCHMARK side is shingled, deduplicated, and `broadcast()` — eval
  * sets are thousands of documents, so their distinct shingle set fits in
  * every executor and the corpus-side probe is a broadcast hash join with
  * NO corpus shuffle. The only exchange in [[flagContaminated]] is the
  * per-document aggregate (map-side combined, keyed by doc id), and the
  * corpus text is read exactly once: the per-doc shingle total and the
  * matched-shingle count come out of the SAME exploded pass via a
  * left-join marker, not a second scan. Shingles reuse
  * [[Dedup.shingleSet]] (distinct word n-grams, codegen'd lookahead
  * regex), so the DuckDB oracle shares the jaccard CTE shape verbatim.
  */
object Decontamination {

  /** Per-corpus-document contamination report against the whole benchmark
    * set: `(doc_id, n_shingles, n_contaminated, contamination_ratio)` for
    * every corpus document with at least `minOverlap` distinct n-grams
    * that appear anywhere in the benchmark. Output column `doc_id` takes
    * its name from `idCol`.
    *
    * One corpus scan, one map-side-combined aggregate, benchmark side
    * broadcast — the 100 TB-correct decontamination pass. */
  def flagContaminated(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minOverlap: Long = 1L
  ): DataFrame = {
    require(n >= 1, s"shingle n must be >= 1, got $n")
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val corpusSh = corpus.select(col(idCol),
      explode(Dedup.shingleSet(col(textCol), n)).as("__shingle"))
    val benchSh = benchmark
      .select(explode(Dedup.shingleSet(col(textCol), n)).as("__shingle"))
      .distinct()
      .withColumn("__hit", lit(1))
    corpusSh
      .join(broadcast(benchSh), Seq("__shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_contaminated"))
      .where(col("n_contaminated") >= lit(minOverlap))
      .withColumn("contamination_ratio",
        col("n_contaminated").cast("double") / col("n_shingles"))
  }

  /** Attribution variant: which benchmark document leaked into which
    * corpus document. `(doc_id, bench_id, n_common)` for every
    * (corpus, benchmark) pair sharing at least `minCommon` distinct
    * n-grams — the audit table a release review reads after
    * [[flagContaminated]] names the dirty docs. Same broadcast shape;
    * the aggregate is keyed by the (corpus, bench) pair, whose
    * cardinality is bounded by matches, not by the corpus. */
  def contaminationPairs(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minCommon: Long = 1L
  ): DataFrame = {
    require(n >= 1, s"shingle n must be >= 1, got $n")
    val corpusSh = corpus.select(col(idCol),
      explode(Dedup.shingleSet(col(textCol), n)).as("__shingle"))
    val benchSh = benchmark.select(col(idCol).as("bench_id"),
      explode(Dedup.shingleSet(col(textCol), n)).as("__shingle"))
    corpusSh
      .join(broadcast(benchSh), Seq("__shingle"))
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= lit(minCommon))
  }
}
