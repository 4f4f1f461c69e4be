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

  test("segmentWord applies merges by rank; unseen words fall back to characters") {
    val m = Bpe.train(Seq("low" -> 5L, "lowest" -> 5L), numMerges = 3)
    val rank = m.rank
    val low = Bpe.segmentWord("low", rank)
    assert(low.mkString("|") == "low" || low.forall(_.nonEmpty))
    assert(Bpe.segmentWord("xyz", rank) == Seq("x", "y", "z"),
      "no learned merge applies to an unseen alphabet")
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
    // stream-packing contract under TRUE subword counts: offsets are the
    // exclusive prefix sum of n_tokens, packs are budget-sized windows of
    // the token stream (zero waste: exactly ceil(total/budget) packs)
    val total = packed.map(_._1).sum
    assert(packed.map(_._3).distinct.length == ((total + 63) / 64).toInt,
      "stream packing must use exactly ceil(total/budget) packs")
    assert(packed.forall { case (_, off, pid, poff) =>
      pid == off / 64 && poff == off % 64 && poff < 64
    }, "every document's pack coordinates must derive from its true-token offset")
  }
}
