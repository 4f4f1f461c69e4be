package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}

/** Byte-pair-encoding tokenizer training and application — the real
  * subword counts the packing/chunking budget heuristics approximate
  * (`TextFunctions.bpeishTokenCount` estimates; this LEARNS the merges
  * from the corpus, the Sennrich-2016 / HF `tokenizers` shape).
  *
  * Scale split, exactly like the reference implementations:
  *   - the only corpus-sized step is ONE distributed scan aggregating
  *     the word-frequency table (map-side combined; shuffle volume =
  *     distinct words), truncated to `maxWords` by a deterministic
  *     (count desc, word asc) cut — BPE training operates on word
  *     counts, never raw text, so a 100 TB corpus reduces to a
  *     bounded table before any iteration runs;
  *   - the merge loop runs driver-side over that bounded table (the
  *     same place HF runs it); every tie breaks lexicographically so
  *     the learned merges are a pure function of the word counts;
  *   - application broadcasts the merge ranks and segments each
  *     partition's documents in a `mapPartitions` batch — the same
  *     broadcast-small-model shape as the multimodal decoder; no
  *     per-row UDF, no shuffle.
  */
object Bpe {

  /** Learned merges in order: (rank, left symbol, right symbol). */
  final case class Merges(pairs: IndexedSeq[(String, String)]) {
    def rank: Map[(String, String), Int] = pairs.zipWithIndex.toMap
  }

  /** The corpus word-frequency table (deterministic top-`maxWords`):
    * the bounded artifact BPE trains on. */
  def wordCounts(df: DataFrame, textCol: String, maxWords: Int): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)

  /** Learn `numMerges` merges from the (word, n) table. Pure function of
    * the counts: pair frequencies are weighted by word count, the best
    * pair is (max frequency, then lexicographic smallest), merging stops
    * early when no pair repeats. */
  def train(counts: Seq[(String, Long)], numMerges: Int): Merges = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words: Seq[(IndexedSeq[String], Long)] =
      counts.map { case (w, n) => (w.map(_.toString).toIndexedSeq, n) }
    val merges = IndexedSeq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairFreq = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairFreq(p) = pairFreq.getOrElse(p, 0L) + n
          j += 1
        }
      }
      val best = pairFreq.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case None => done = true
        case Some((pair, _)) =>
          merges += pair
          val joined = pair._1 + pair._2
          words = words.map { case (syms, n) =>
            val out = IndexedSeq.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
                out += joined; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), n)
          }
      }
      i += 1
    }
    Merges(merges.result())
  }

  /** Convenience: one corpus scan + driver training. */
  def trainOnCorpus(
      df: DataFrame, textCol: String, numMerges: Int, maxWords: Int = 100000): Merges =
    train(
      wordCounts(df, textCol, maxWords).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toIndexedSeq,
      numMerges)

  /** Segment one word with rank-ordered merges (the standard BPE apply:
    * repeatedly merge the present pair with the lowest rank). */
  def segmentWord(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toIndexedSeq
    var continue = syms.length > 1
    while (continue) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        rank.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = j }
        }
        j += 1
      }
      if (bestIdx < 0) continue = false
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** Batch segmentation: broadcast the merge ranks, tokenize every
    * document into BPE subwords per partition. Output schema:
    * (idCol: long, tokens: array<string>, n_tokens: int) — `n_tokens`
    * is the TRUE packing/chunking budget unit the `bpeish` heuristics
    * approximate. */
  def segment(df: DataFrame, idCol: String, textCol: String, merges: Merges): DataFrame = {
    val spark = df.sparkSession
    val rankB = spark.sparkContext.broadcast(merges.rank)
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("tokens", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("n_tokens", IntegerType, nullable = false)))
    val input = df.select(col(idCol).cast("long"), lower(trim(col(textCol))))
    val rows = input.rdd.mapPartitions { it =>
      val rank = rankB.value
      it.map { r =>
        val id = r.getLong(0)
        val words = Option(r.getString(1)).getOrElse("").split("\\s+").filter(_.nonEmpty)
        val toks = words.flatMap(w => segmentWord(w, rank))
        Row(id, toks.toSeq, toks.length)
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
