package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    lazy val rank: Map[(String, String), Int] = pairs.zipWithIndex.toMap
  }

  /** Code-point symbols: a surrogate pair (emoji, any non-BMP char)
    * stays ONE symbol — `word.map(_.toString)` would split it into two
    * lone surrogates that corrupt round-tripping and double-count the
    * token budget on multilingual text. */
  private def symbols(word: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
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
      counts.map { case (w, n) => (symbols(w), n) }
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
      val best = pairFreq.filter(_._2 >= 2)
        .minByOption { case ((a, b), n) => (-n, a, b) }
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
    var syms = symbols(word)
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
    * document into BPE subwords per partition via the typed Dataset
    * `mapPartitions` (Tungsten-encoded both ways — no external Row
    * boxing). Output schema: (idCol: long, tokens: array<string>,
    * n_tokens: int) — `n_tokens` is the TRUE packing/chunking budget
    * unit the `bpeish` heuristics approximate. Rows with a NULL id are
    * dropped (the assignSplit/shard null contract: no silent default);
    * NULL text segments to zero tokens. */
  def segment(df: DataFrame, idCol: String, textCol: String, merges: Merges): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rankB = spark.sparkContext.broadcast(merges.rank)
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), lower(trim(col(textCol))))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rank = rankB.value
        it.map { case (id, text) =>
          val words = Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty)
          val toks: Seq[String] = words.flatMap(w => segmentWord(w, rank)).toSeq
          (id, toks, toks.length)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** Persist learned merges as JSON — train once on the full corpus,
    * reuse the artifact across runs/clusters (the HF `merges.txt` role;
    * same Jackson-on-the-Spark-classpath shape as `tree.ModelIO`).
    * Order IS the rank, so the file stores an ordered pair array. */
  def saveMerges(merges: Merges, path: String): Unit = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.JsonNodeFactory
    val nf = JsonNodeFactory.instance
    val root = nf.objectNode()
    root.put("format", "bpe-merges")
    root.put("version", 1)
    val arr = root.putArray("merges")
    merges.pairs.foreach { case (a, b) =>
      val p = nf.arrayNode(); p.add(a); p.add(b); arr.add(p)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      new ObjectMapper().writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  /** Load merges written by [[saveMerges]]; validates the format marker
    * and pair shape loudly rather than mis-segmenting downstream. */
  def loadMerges(path: String): Merges = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val root = new ObjectMapper().readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    require(root.path("format").asText() == "bpe-merges",
      s"$path is not a bpe-merges file (format=${root.path("format").asText()})")
    val arr = root.get("merges")
    require(arr != null && arr.isArray, s"$path: missing merges array")
    val pairs = IndexedSeq.newBuilder[(String, String)]
    val it = arr.elements()
    while (it.hasNext) {
      val p = it.next()
      require(p.isArray && p.size() == 2, s"$path: each merge must be a 2-element array")
      pairs += ((p.get(0).asText(), p.get(1).asText()))
    }
    Merges(pairs.result())
  }
}
