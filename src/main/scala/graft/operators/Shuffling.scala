package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global shuffle and sharding for training-order
  * reproducibility. A training run must visit the corpus in an order
  * that is (a) statistically random, (b) identical across re-runs and
  * cluster sizes, and (c) producible WITHOUT a driver-side collect —
  * so the order key is a content hash of (id, seed), never `rand()`
  * (whose draw depends on partitioning and task retries).
  *
  * Scale shape: `orderBy(key)` compiles to Spark's range-partitioned
  * sort — a sampled range Exchange then per-partition sorts — so the
  * "global shuffle" of a 100 TB corpus is one shuffle with every task
  * sorting its slice; no single-task stage anywhere. Epoch k of a
  * multi-epoch run is `seed + k`: a fresh independent permutation with
  * zero stored state. [[shard]] buckets by the same hash for writing N
  * deterministic shards (the file-per-worker layout data loaders want).
  */
object Shuffling {

  /** md5-based order key — hex string of `md5(id || ':' || seed)`.
    * md5 here is a deterministic permutation key, not crypto; chosen
    * over xxhash64 because it reproduces bit-for-bit in every engine
    * (the DuckDB oracle shares the expression verbatim). */
  def shuffleKey(idCol: Column, seed: Long): Column =
    md5(concat(idCol.cast("string"), lit(":" + seed)))

  /** The corpus in deterministic pseudo-random order: appends
    * `shuffle_key` and globally sorts by it (ties broken by id so the
    * order is total even under hash collisions). */
  def deterministicShuffle(
      df: DataFrame,
      idCol: String,
      seed: Long
  ): DataFrame =
    df.withColumn("shuffle_key", shuffleKey(col(idCol), seed))
      .orderBy(col("shuffle_key"), col(idCol))

  /** Uniform fraction in [0, 1) derived from the shuffle key: the first
    * 8 hex digits as a 32-bit integer over 2^32. The basis for split
    * assignment — identical arithmetic reproduces in any engine. */
  def hashFraction(idCol: Column, seed: Long): Column =
    conv(substring(shuffleKey(idCol, seed), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** Deterministic named dataset splits (train/val/test): each row's
    * hash fraction lands in one of the cumulative weight intervals.
    * Properties a training pipeline relies on:
    *  - reproducible: pure function of (id, seed) — stable across runs,
    *    cluster sizes, partitionings, and task retries;
    *  - disjoint and exhaustive: the when-chain covers [0, 1);
    *  - stratification-free by construction: the hash is independent of
    *    every column, so each stratum (language, source, ...) splits in
    *    the same proportions without per-stratum machinery;
    *  - monotone under re-weighting: growing a split's weight only ADDS
    *    rows to it (same threshold-sampling property as
    *    [[graft.operators.Chunking.sampleByHash]]), so train never
    *    leaks into a shrunken test set across config changes.
    * Pure projection — no shuffle, runs at scan speed. */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      seed: Long
  ): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0), s"negative split weight in $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val frac = hashFraction(col(idCol), seed)
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    // last bucket is the otherwise-branch: no < 1.0 edge case on doubles
    val chain = splits.init.zip(cum.init).reverse
      .foldLeft(lit(splits.last._1): Column) { case (rest, ((name, _), bound)) =>
        when(frac < lit(bound), lit(name)).otherwise(rest)
      }
    // a NULL id gets a NULL split (same contract as shard's null shard) —
    // without this the null hash fraction falls through every `<` branch
    // and the otherwise-chain silently dumps every null-id row into the
    // LAST split, skewing exactly the set (usually 'test') that can least
    // afford it
    df.withColumn("split", when(col(idCol).isNotNull, chain))
  }

  /** Exactly-N-per-stratum deterministic sample: rank each stratum's
    * rows by the seeded hash key (total order — ties broken by id) and
    * keep the first `n` — the balanced-eval-set / per-language-probe
    * primitive that rate-based sampling ([[graft.operators.Chunking
    * .sampleByHash]]) can't express when strata sizes differ wildly.
    * Reproducible: the kept set is a pure function of (id, stratum,
    * seed). Nested sampling property: the top-N set is a PREFIX of the
    * top-M set for N < M (same hash order), so growing a probe set
    * never replaces rows, only appends.
    *
    * The rank is a per-stratum window — one shuffle keyed by stratum,
    * partition size = stratum size. For mega-strata at 100 TB, pre-cut
    * with `hashFraction(id, seed) < rate` (SAME seed, rate ~ c*n/
    * |stratum|) to bound the window input, then rank exactly: the
    * fraction cut is a down-set of the hex order (the fraction is the
    * key's first 8 hex digits), so the two-pass result is IDENTICAL to
    * the direct one whenever the cut keeps >= n rows per stratum
    * (asserted in ShufflingSpec). */
  def sampleNPerStratum(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      n: Int,
      seed: Long
  ): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(shuffleKey(col(idCol), seed), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Strictly-positive uniform in (0, 1) for log-based sampling keys:
    * (first-8-hex-digits + 0.5) / 2^32 — never 0 (so `ln` never hits
    * -inf) and never 1. Integer-to-double conversion is exact below
    * 2^53, so the value reproduces bit-for-bit in any engine. */
  def hashUniformOpen(idCol: Column, seed: Long): Column =
    (conv(substring(shuffleKey(idCol, seed), 1, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)

  /** Weighted sample WITHOUT replacement of exactly `n` rows
    * (Efraimidis & Spirakis 2006, the exponential-race form): each row
    * draws key = -ln(u) / w with u a seeded content-hash uniform, and
    * the n smallest keys win — distributionally identical to sequential
    * weighted draws without replacement, in one pass with no sequential
    * state. The curation use: sample a training subset where selection
    * probability tracks a quality/length/importance weight instead of
    * being uniform ([[sampleNPerStratum]]'s regime).
    *
    * Deterministic: the key is a pure function of (id, weight, seed) —
    * stable across runs, partitionings, and retries, and replayable in
    * SQL (`-ln((hex8 + 0.5)/2^32)/w`). Nested-sample property: the
    * top-n set is a prefix of the top-m set for n < m, so growing a
    * sample only appends. Rows with NULL or non-positive weight are
    * excluded (a zero weight must never win; a negative one is a caller
    * bug surfaced by the `weighted_sample` contract, not silently
    * ranked first).
    *
    * Scale shape: the key is a scan-speed projection and the cut
    * compiles to TakeOrderedAndProject — per-partition n-row heaps and
    * a driver merge of n rows; the corpus is never globally sorted. */
  def weightedSampleN(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Int,
      seed: Long
  ): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val w = col(weightCol).cast("double")
    // NaN must be excluded explicitly: Spark orders NaN ABOVE every
    // number, so `w > 0` alone would admit it (and its NaN key would
    // quietly ride along at the bottom of every sample)
    df.where(w.isNotNull && !isnan(w) && w > 0 && col(idCol).isNotNull)
      .withColumn("sample_key", -log(hashUniformOpen(col(idCol), seed)) / w)
      .orderBy(col("sample_key"), col(idCol))
      .limit(n)
  }

  /** Deterministic shard assignment in [0, numShards): the first 8 hex
    * digits of the shuffle key mod `numShards`. Stable across runs and
    * cluster sizes; `repartition(numShards, col("shard"))` + a
    * partitioned write gives data loaders one file list per worker. */
  def shard(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      seed: Long
  ): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    df.withColumn("shard",
      (conv(substring(shuffleKey(col(idCol), seed), 1, 8), 16, 10)
        .cast("long") % numShards).cast("int"))
  }
}
