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
  *
  * Two alphabets:
  *   - word-level (default): lowercase + whitespace-split words,
  *     code-point symbols — the compact demo/bench mode;
  *   - byte-level (`byteLevel = true`): the GPT-2 byte alphabet
  *     ([[ByteLevel]]) over a case-preserving run pre-tokenizer —
  *     no OOV, and `decodeTokens` round-trips arbitrary UTF-8
  *     (case, punctuation, exact whitespace) losslessly.
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

  /** GPT-2's byte <-> unicode bijection (Radford et al. 2019,
    * `encoder.py` — public): the 188 printable latin-1 bytes map to
    * themselves; the other 68 map to U+0100.. in order. Every byte
    * becomes exactly one printable, whitespace-free char, so byte-level
    * symbols are plain strings, merges JSON-serialize unchanged, and no
    * input byte sequence is ever out-of-vocabulary. */
  object ByteLevel {
    private val printable: Set[Int] =
      (('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF)).toSet
    val byteToChar: Array[Char] = {
      val arr = new Array[Char](256)
      var n = 0
      (0 until 256).foreach { b =>
        if (printable(b)) arr(b) = b.toChar
        else { arr(b) = (256 + n).toChar; n += 1 }
      }
      arr
    }
    val charToByte: Map[Char, Byte] =
      byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

    /** UTF-8 bytes of `s`, each mapped to its stand-in char. */
    def encode(s: String): String = {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val sb = new java.lang.StringBuilder(bytes.length)
      bytes.foreach(b => sb.append(byteToChar(b & 0xff)))
      sb.toString
    }

    /** Inverse of [[encode]]: stand-in chars -> bytes -> UTF-8 string.
      * Throws on a char outside the table (not a byte-level token). */
    def decode(s: String): String = {
      val out = new Array[Byte](s.length)
      var i = 0
      while (i < s.length) {
        out(i) = charToByte.getOrElse(s.charAt(i),
          throw new IllegalArgumentException(
            s"not a byte-level symbol char: U+${s.charAt(i).toInt.toHexString}"))
        i += 1
      }
      new String(out, java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** Byte-level symbols: one symbol per UTF-8 BYTE (via the stand-in
    * char), the GPT-2 alphabet — case-preserving, punctuation-agnostic,
    * zero OOV risk. */
  private def byteSymbols(word: String): IndexedSeq[String] =
    ByteLevel.encode(word).map(_.toString)

  /** Case-preserving pre-tokenizer for byte-level mode: split into
    * alternating whitespace / non-whitespace RUNS. Every character of
    * the input lands in exactly one run, so the concatenation of runs
    * (and hence of decoded tokens) reproduces the input byte-for-byte —
    * the lossless-round-trip property word-level mode (lowercase +
    * whitespace-discarding split) deliberately trades away. */
  private[operators] def preTokenizeRuns(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < text.length) {
      val ws = Character.isWhitespace(text.charAt(i))
      var j = i + 1
      while (j < text.length && Character.isWhitespace(text.charAt(j)) == ws) j += 1
      out += text.substring(i, j)
      i = j
    }
    out.result()
  }

  /** Byte-level twin of [[wordCounts]]: the run-frequency table over the
    * case-preserving run pre-tokenizer (whitespace runs count too — they
    * carry merges like doubled newlines). Same deterministic top-`maxWords`
    * cut. The regex alternation `\s+|\S+` tiles the text exactly. */
  def runCounts(df: DataFrame, textCol: String, maxWords: Int): DataFrame =
    df.select(explode(regexp_extract_all(
        coalesce(col(textCol), lit("")), lit("\\s+|\\S+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)

  /** Join byte-level tokens back to the original text (lossless inverse
    * of byte-level [[segment]]). */
  def decodeTokens(tokens: Seq[String]): String =
    ByteLevel.decode(tokens.mkString)

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
    * early when no pair repeats.
    *
    * The loop is INCREMENTAL (the shape real tokenizer trainers use for
    * ~32k-merge vocabularies): pair frequencies are maintained in one
    * map, and each merge touches only the words that actually contain
    * the merged pair (tracked by an inverted pair -> word-ids index) —
    * subtract the word's old pair counts, rewrite it, add the new ones.
    * A full recompute per merge would be O(numMerges x corpus symbols);
    * this is O(numMerges x affected-word symbols). Results are
    * bit-identical to the full recompute (BpeSpec proves it
    * differentially against a naive trainer). */
  def train(counts: Seq[(String, Long)], numMerges: Int,
      byteLevel: Boolean = false): Merges = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val sym: String => IndexedSeq[String] = if (byteLevel) byteSymbols else symbols
    val words: Array[IndexedSeq[String]] = counts.map(c => sym(c._1)).toArray
    val ns: Array[Long] = counts.map(_._2).toArray
    val pairFreq = scala.collection.mutable.Map[(String, String), Long]()
    // stale-tolerant inverted index: ids are never removed on subtract;
    // a merge filters to words that still contain its pair
    val pairWords = scala.collection.mutable.Map[(String, String),
      scala.collection.mutable.Set[Int]]()

    def addPairs(idx: Int, sign: Long): Unit = {
      val syms = words(idx); val n = ns(idx)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val nv = pairFreq.getOrElse(p, 0L) + sign * n
        if (nv == 0L) pairFreq.remove(p) else pairFreq(p) = nv
        if (sign > 0) pairWords.getOrElseUpdate(
          p, scala.collection.mutable.Set.empty) += idx
        j += 1
      }
    }
    def containsPair(syms: IndexedSeq[String], p: (String, String)): Boolean = {
      var j = 0
      while (j < syms.length - 1) {
        if (syms(j) == p._1 && syms(j + 1) == p._2) return true
        j += 1
      }
      false
    }
    def applyMerge(syms: IndexedSeq[String], p: (String, String)): IndexedSeq[String] = {
      val joined = p._1 + p._2
      val out = IndexedSeq.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
          out += joined; j += 2
        } else { out += syms(j); j += 1 }
      }
      out.result()
    }

    words.indices.foreach(addPairs(_, 1L))
    val merges = IndexedSeq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      // full ordering on (freq desc, pair asc): deterministic regardless
      // of map iteration order
      val best = pairFreq.iterator.filter(_._2 >= 2)
        .reduceOption((x, y) =>
          if (implicitly[Ordering[(Long, String, String)]]
            .lt((-x._2, x._1._1, x._1._2), (-y._2, y._1._1, y._1._2))) x else y)
      best match {
        case None => done = true
        case Some((pair, _)) =>
          merges += pair
          pairWords.remove(pair).foreach(_.foreach { idx =>
            if (containsPair(words(idx), pair)) {
              addPairs(idx, -1L)
              words(idx) = applyMerge(words(idx), pair)
              addPairs(idx, 1L)
            }
          })
          pairFreq.remove(pair) // zeroed by subtraction; defensive
      }
      i += 1
    }
    Merges(merges.result())
  }

  /** Convenience: one corpus scan + driver training. `byteLevel` swaps
    * in the run pre-tokenizer and the byte alphabet. */
  def trainOnCorpus(
      df: DataFrame, textCol: String, numMerges: Int, maxWords: Int = 100000,
      byteLevel: Boolean = false): Merges = {
    val table = if (byteLevel) runCounts(df, textCol, maxWords)
      else wordCounts(df, textCol, maxWords)
    train(table.collect().map(r => r.getString(0) -> r.getLong(1)).toIndexedSeq,
      numMerges, byteLevel)
  }

  /** Segment one word with rank-ordered merges (the standard BPE apply:
    * repeatedly merge the present pair with the lowest rank). */
  def segmentWord(word: String, rank: Map[(String, String), Int],
      byteLevel: Boolean = false): Seq[String] = {
    var syms = if (byteLevel) byteSymbols(word) else symbols(word)
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
  def segment(df: DataFrame, idCol: String, textCol: String, merges: Merges,
      byteLevel: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rankB = spark.sparkContext.broadcast(merges.rank)
    // byte-level is case-preserving: the raw text IS the input; word-level
    // keeps the lowercase + whitespace-split the bench lines and twins pin
    val textExpr = if (byteLevel) col(textCol).cast("string")
      else lower(trim(col(textCol)))
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), textExpr)
      .as[(Long, String)]
      .mapPartitions { it =>
        val rank = rankB.value
        it.map { case (id, text) =>
          val words: Seq[String] =
            if (byteLevel) preTokenizeRuns(text)
            else Option(text).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq
          val toks: Seq[String] = words.flatMap(w => segmentWord(w, rank, byteLevel))
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
