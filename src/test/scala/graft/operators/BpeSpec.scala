package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("train learns the classic merges on a hand-computed corpus") {
    // words: "low" x5, "lower" x2, "newest" x6, "widest" x3
    // pair counts round 1: (e,s) 9, (s,t) 9, (l,o) 7, (o,w) 7, ...
    // tie (e,s)/(s,t) at 9 breaks lexicographically -> (e,s) first
    val counts = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m = Bpe.train(counts, numMerges = 4)
    assert(m.pairs.take(2) == Seq(("e", "s"), ("es", "t")),
      s"first merges must be es then est, got ${m.pairs}")
    assert(m.pairs.length == 4)
    // merges are a pure function of counts: same input, same merges
    assert(Bpe.train(counts, 4) == m)
  }

  test("train stops early when no pair repeats") {
    val m = Bpe.train(Seq("ab" -> 1L), numMerges = 10)
    assert(m.pairs.isEmpty, "a pair seen once must not merge")
  }

  test("byte-level 1k-merge train: vocabulary = alphabet + one distinct symbol per merge") {
    import org.apache.spark.sql.functions._
    // the bpe_byte_level_1k bench corpus at test scale: documents with
    // tokens suffixed into ~500 variants (the raw synthetic vocabulary
    // exhausts at 89 merges; this one sustains the full 1,024)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("text",
        array_join(transform(split(col("text"), "\\s+"), (t, i) =>
          concat(t, lit("_"), pmod(xxhash64(t, i), lit(499)))), " "))
    val merges = Bpe.trainOnCorpus(docs, "text", numMerges = 1024, byteLevel = true)
    assert(merges.pairs.length == 1024, "the rich corpus must sustain all 1,024 merges")
    // every merge mints exactly one NEW multi-char symbol: distinct among
    // themselves and disjoint from the single-char byte alphabet, so
    // |vocab| = |alphabet| + |merges| by construction
    val minted = merges.pairs.map(p => p._1 + p._2)
    assert(minted.distinct.size == minted.size, "merge symbols must be distinct")
    assert(minted.forall(_.length >= 2), "merged symbols are disjoint from the 1-char alphabet")
    // the segmented corpus emits only alphabet or minted symbols
    val emitted = Bpe.segment(docs, "doc_id", "text", merges, byteLevel = true)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("tokens")).as("t"))
      .distinct().collect().map(_.getString(0)).toSet
    val mintedSet = minted.toSet
    assert(emitted.forall(t => t.length == 1 || mintedSet.contains(t)),
      "every emitted token is a 1-char alphabet symbol or a minted merge symbol")
  }

  test("segmentWord applies merges by rank; unseen words fall back to characters") {
    // merges from low x5 + lowest x5: (l,o) then (lo,w) then (e,s) -- so
    // an in-vocabulary word collapses to exactly one token
    val m = Bpe.train(Seq("low" -> 5L, "lowest" -> 5L), numMerges = 3)
    assert(m.pairs == Seq(("l", "o"), ("lo", "w"), ("e", "s")), s"got ${m.pairs}")
    val rank = m.rank
    assert(Bpe.segmentWord("low", rank) == Seq("low"),
      "a fully-merged vocabulary word must segment to one token")
    assert(Bpe.segmentWord("lowes", rank) == Seq("low", "es"),
      "partial words reuse the learned subwords")
    assert(Bpe.segmentWord("xyz", rank) == Seq("x", "y", "z"),
      "no learned merge applies to an unseen alphabet")
  }

  test("supplementary-plane characters stay whole symbols") {
    val emoji = new String(Character.toChars(0x1F600)) // outside the BMP
    val word = s"a${emoji}b"
    val m = Bpe.train(Seq(word -> 3L), numMerges = 1)
    // the first merge pairs full code points — NO lone surrogate may
    // appear in either half (a half that contains a high surrogate must
    // also contain its low partner, i.e. be a well-formed string)
    m.pairs.foreach { case (a, b) =>
      Seq(a, b).foreach { half =>
        assert(half.codePoints().toArray.forall(Character.isValidCodePoint),
          s"merge half '$half' is not well-formed UTF-16")
        assert(!half.exists(c => Character.isSurrogate(c) && half.length == 1),
          s"merge half '$half' is a lone surrogate")
        // stronger: every surrogate in the half must be part of a pair
        var i = 0
        while (i < half.length) {
          val cp = half.codePointAt(i)
          assert(!Character.isSurrogate(half.charAt(i)) || Character.charCount(cp) == 2,
            s"lone surrogate inside merge half '$half'")
          i += Character.charCount(cp)
        }
      }
    }
    val seg = Bpe.segmentWord(word, Map.empty)
    assert(seg == Seq("a", emoji, "b"),
      s"code points must not split into surrogate halves, got $seg")
  }

  test("incremental trainer is bit-identical to a naive full-recompute trainer") {
    // naive reference: recompute every pair frequency each round (the
    // textbook Sennrich loop the incremental index must reproduce)
    def naive(counts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
      var words = counts.map { case (w, n) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toIndexedSeq, n)
      }
      val out = Seq.newBuilder[(String, String)]
      var done = false
      for (_ <- 0 until numMerges if !done) {
        val freq = scala.collection.mutable.Map[(String, String), Long]()
        words.foreach { case (s, n) =>
          s.sliding(2).foreach { case Seq(a, b) => freq((a, b)) = freq.getOrElse((a, b), 0L) + n
                                 case _ => () }
        }
        freq.filter(_._2 >= 2).minByOption { case ((a, b), n) => (-n, a, b) } match {
          case None => done = true
          case Some((p, _)) =>
            out += p
            words = words.map { case (s, n) =>
              val b = IndexedSeq.newBuilder[String]; var j = 0
              while (j < s.length) {
                if (j < s.length - 1 && s(j) == p._1 && s(j + 1) == p._2) { b += p._1 + p._2; j += 2 }
                else { b += s(j); j += 1 }
              }
              (b.result(), n)
            }
        }
      }
      out.result()
    }
    val rng = new scala.util.Random(20260813L)
    for (trial <- 1 to 25) {
      val vocab = (1 to 3 + rng.nextInt(20)).map { _ =>
        val len = 1 + rng.nextInt(8)
        (1 to len).map(_ => ('a' + rng.nextInt(4)).toChar).mkString -> (1L + rng.nextInt(9))
      }
      val n = rng.nextInt(12)
      assert(Bpe.train(vocab, n).pairs == naive(vocab, n).toIndexedSeq,
        s"trial $trial diverged on vocab $vocab with $n merges")
    }
  }

  test("byte-level segment -> decodeTokens round-trips arbitrary UTF-8 losslessly") {
    val rng = new scala.util.Random(42)
    def randomText(): String = {
      val sb = new StringBuilder
      for (_ <- 0 until rng.nextInt(60)) {
        rng.nextInt(6) match {
          case 0 => sb.append(Seq(" ", "\t", "\n", "  ", "\r\n")(rng.nextInt(5)))
          case 1 => sb.append(('A' + rng.nextInt(26)).toChar) // CASE preserved
          case 2 => sb.append(('a' + rng.nextInt(26)).toChar)
          case 3 => sb.append(Seq(",", ".", "!", "«", "»", "—", "'")(rng.nextInt(7)))
          case 4 => sb.append(Seq("é", "ß", "ñ", "中", "文", "λ")(rng.nextInt(6)))
          case 5 => sb.appendAll(Character.toChars(0x1F300 + rng.nextInt(0x200)))
        }
      }
      sb.toString
    }
    val texts = ("" +: "MiXeD CaSe, punct-attached!" +: "  leading and trailing\n\n" +:
      (1 to 40).map(_ => randomText())).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val docs = texts.toDF("doc_id", "text")
    val merges = Bpe.trainOnCorpus(docs, "text", numMerges = 30, byteLevel = true)
    val seg = Bpe.segment(docs, "doc_id", "text", merges, byteLevel = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.foreach { case (id, t) =>
      assert(Bpe.decodeTokens(seg(id)) == t,
        s"doc $id failed lossless round trip: '$t'")
    }
    // and with NO merges at all (pure byte alphabet)
    val seg0 = Bpe.segment(docs, "doc_id", "text", Bpe.Merges(IndexedSeq.empty),
        byteLevel = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.foreach { case (id, t) => assert(Bpe.decodeTokens(seg0(id)) == t) }
  }

  test("byte-level mode preserves case and attaches merges across punctuation") {
    val docs = Seq((1L, "Hello, World! Hello, World! Hello, World!")).toDF("doc_id", "text")
    val merges = Bpe.trainOnCorpus(docs, "text", numMerges = 12, byteLevel = true)
    val toks = Bpe.segment(docs, "doc_id", "text", merges, byteLevel = true)
      .head().getSeq[String](1)
    val decoded = Bpe.decodeTokens(toks)
    assert(decoded == "Hello, World! Hello, World! Hello, World!",
      "case and punctuation must survive byte-level segmentation")
    assert(decoded.contains("H") && decoded.contains("W"), "case preserved")
  }

  test("saveMerges/loadMerges round-trips ranks exactly, including non-BMP symbols") {
    val emoji = new String(Character.toChars(0x1F600))
    val m = Bpe.Merges(IndexedSeq(("l", "o"), ("lo", "w"), ("a", emoji), ("e", "s")))
    val path = java.nio.file.Files.createTempFile("bpe_merges", ".json").toString
    try {
      Bpe.saveMerges(m, path)
      val loaded = Bpe.loadMerges(path)
      assert(loaded == m, "merge order (= rank) and symbols must survive the round trip")
      assert(Bpe.segmentWord("lowes", loaded.rank) == Bpe.segmentWord("lowes", m.rank))
      // a foreign file fails loudly instead of mis-segmenting downstream
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), """{"tree":{}}""")
      assertThrows[IllegalArgumentException](Bpe.loadMerges(path))
    } finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
  }

  test("distributed wordCounts + segment round-trip; n_tokens is the real budget") {
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest")
    ).toDF("doc_id", "text")
    val merges = Bpe.trainOnCorpus(docs, "text", numMerges = 8)
    assert(merges.pairs.nonEmpty)
    val seg = Bpe.segment(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getInt(2))).toMap
    // token arrays re-concatenate to the original words
    assert(seg(1L)._1.mkString == "low" * 5 + "lower" * 2)
    assert(seg.values.forall { case (toks, n) => toks.length == n })
    // with 8 merges over this tiny vocab, frequent words collapse to
    // few subwords: the BPE count must be well under the char count
    val charCount = "newest".length * 6
    assert(seg(2L)._2 < charCount, s"got ${seg(2L)._2} vs chars $charCount")
    // determinism across partitionings
    val seg2 = Bpe.segment(docs.repartition(3), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(seg.map { case (k, v) => k -> v._2 } == seg2)
  }

  test("segment feeds packing: budget adherence under true subword counts") {
    val docs = (1L to 40L).map(i => (i, ("newest widest lowest " * (i % 5 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val merges = Bpe.trainOnCorpus(docs, "text", numMerges = 12)
    val seg = Bpe.segment(docs, "doc_id", "text", merges)
      .withColumn("n_tokens", org.apache.spark.sql.functions.col("n_tokens").cast("long"))
    val packed = Packing.packByBudget(seg, "doc_id", "n_tokens", budget = 64L, numBuckets = 4)
      .collect().map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("offset"),
        r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))
    // stream-packing contract under TRUE subword counts: offsets are an
    // exclusive prefix sum of n_tokens (contiguous token stream), and
    // every pack coordinate derives from that offset. (Pack COUNT is not
    // asserted: a pack holding only the straddling tail of a document
    // legitimately contains no document start.)
    val byOffset = packed.sortBy(_._2)
    val expectOffsets = byOffset.map(_._1).scanLeft(0L)(_ + _).init
    assert(byOffset.map(_._2).toSeq == expectOffsets.toSeq,
      "offsets must form an exclusive prefix sum of the true token counts")
    assert(packed.forall { case (_, off, pid, poff) =>
      pid == off / 64 && poff == off % 64 && poff < 64
    }, "every document's pack coordinates must derive from its true-token offset")
  }
}
