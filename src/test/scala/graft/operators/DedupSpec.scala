package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("exact dedup groups identical texts, keeps min id") {
    val d = docs(1L -> "hello world", 2L -> "hello world", 3L -> "goodbye", 4L -> "hello world")
    val groups = Dedup.exact(d, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(groups == Map(1L -> 3L, 3L -> 1L)) // keep_id -> n_copies
  }

  test("jaccard maxDf cap: identity below the cap, hot-gram pairs drop above it") {
    // docs 1/2 share their full text; docs 3/4 share only the hot token
    // planted in EVERY doc (df = 4)
    val d = docs(
      1L -> "hot a b c d", 2L -> "hot a b c d",
      3L -> "hot p q r s", 4L -> "hot t u v w")
    def pairs(cap: Option[Long]) =
      Dedup.jaccardPairs(d, "doc_id", "text", n = 1, threshold = 0.9, maxDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a cap no gram exceeds must not change the output at all
    assert(pairs(Some(100L)) == pairs(None))
    assert(pairs(None) == Set((1L, 2L)))
    // a cap excluding the df=4 hot token: the 1~2 pair survives via its
    // other 4 shared tokens (jaccard 4/6 — set sizes still count the
    // capped gram); no spurious candidates form through "hot"
    val capped = Dedup.jaccardPairs(d, "doc_id", "text", n = 1, threshold = 0.6,
        maxDf = Some(3L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
  }

  test("jaccard pairs: hand-computed similarity on unigram sets") {
    // A={a,b,c,d}, B={a,b,c,e}: |∩|=3, |∪|=5, J=0.6
    val d = docs(1L -> "a b c d", 2L -> "a b c e", 3L -> "x y z w")
    val pairs = Dedup.jaccardPairs(d, "doc_id", "text", n = 1, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0.6)))
  }

  test("incremental pairs: batch vs corpus only, both plan shapes agree") {
    val corpus = docs(1L -> "a b c d", 2L -> "p q r s", 3L -> "x y z w")
    val batch = docs(10L -> "a b c e", 11L -> "p q r s", 12L -> "fresh text here")
    // batch-internal near-dups must NOT appear even if present
    val expect = Set((10L, 1L, 0.6), (11L, 2L, 1.0))
    val broadcasted = Dedup.jaccardPairsAgainst(batch, corpus, "doc_id", "text",
        n = 1, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(broadcasted == expect, s"got $broadcasted")
    val shuffled = Dedup.jaccardPairsAgainst(batch, corpus, "doc_id", "text",
        n = 1, threshold = 0.5, broadcastBatch = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(shuffled == expect, "broadcast and shuffle plans must agree")
  }

  test("shingle sets: trigram count and short-doc fallback") {
    import org.apache.spark.sql.functions._
    val d = docs(1L -> "one two three four", 2L -> "tiny doc")
    val sizes = d.select(col("doc_id"), size(Dedup.shingleSet(col("text"), 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sizes(1L) == 2) // "one two three", "two three four"
    assert(sizes(2L) == 1) // whole-text fallback
  }

  test("winnowing: shared run of >= w+k-1 tokens guarantees a common fingerprint") {
    // k=3, w=4: any 6-token shared substring must collide (MOSS coverage)
    val shared = "alpha beta gamma delta epsilon zeta"
    val d = docs(
      1L -> s"one two $shared three four",
      2L -> s"nine eight seven $shared six",
      3L -> "completely different words entirely here now today")
    val pairs = Dedup.winnowedOverlapPairs(d, "doc_id", "text",
        k = 3, w = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "planted 6-token overlap must share a fingerprint")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "disjoint doc must not pair")
    // fingerprints are a strict subset of gram hashes (winnowing selects)
    val fps = Dedup.winnowedFingerprints(d, "doc_id", "text", k = 3, w = 4)
    val grams = d.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.explode(
        Dedup.shingleSeq(org.apache.spark.sql.functions.col("text"), 3)))
    assert(fps.count() < grams.count(), "winnowing must select fewer hashes than grams")
    // short doc (< k tokens) still carries exactly one fingerprint
    val tiny = docs(9L -> "tiny doc")
    assert(Dedup.winnowedFingerprints(tiny, "doc_id", "text", k = 3, w = 4).count() == 1)
  }

  test("witness-exact dedup: a~b~c chain keeps c, greedy drops it") {
    import spark.implicits._
    val d = docs(1L -> "doc a", 2L -> "doc b", 3L -> "doc c", 9L -> "unrelated")
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val greedy = Dedup.dropDuplicatePairs(d, "doc_id", chain)
      .collect().map(_.getLong(0)).toSet
    assert(greedy == Set(1L, 9L), "greedy drops every right-hand id (over-delete)")
    val exact = Dedup.dropDuplicatePairsExact(d, "doc_id", chain)
      .collect().map(_.getLong(0)).toSet
    assert(exact == Set(1L, 3L, 9L),
      "c's only witness b was dropped, so the witness-exact pass keeps c")
  }

  test("witness-exact dedup: triangle keeps only the minimum; every drop has a kept witness") {
    import spark.implicits._
    val d = docs(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e")
    // triangle 1-2-3 plus chain 4~5
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val exact = Dedup.dropDuplicatePairsExact(d, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(exact == Set(1L, 4L))
  }

  test("cluster labels: chain propagates the component min; singletons label themselves") {
    import spark.implicits._
    val d = docs(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e", 9L -> "solo")
    // chain 2~3~4~5 (diameter 3: needs real propagation, the one-join
    // direct-neighbor min would mislabel 4 and 5) plus singleton 1 and 9
    val chain = Seq((2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(d, "doc_id", chain)
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 9L -> 9L))
  }

  test("cluster labels: 64-node chain converges in O(log n) rounds, not O(diameter)") {
    import spark.implicits._
    // diameter-63 path; maxIter=12 would abort diameter-bound propagation
    // (the pre-r12 implementation) but star contraction needs ~log2(64)
    val n = 64
    val d = (1L to n.toLong).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val chain = (1L until n.toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(d, "doc_id", chain, maxIter = 12)
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n && labels.values.forall(_ == 1L),
      "every chain member must reach the component minimum")
    // adversarial orientation: the min id sits at the FAR end of the walk
    val rev = (1L until n.toLong).map(i => (n.toLong - i + 1, n.toLong - i)).toDF("id_a", "id_b")
    val revLabels = Dedup.duplicateClusters(d, "doc_id", rev, maxIter = 12)
      .select("cluster_id").collect().map(_.getLong(0)).toSet
    assert(revLabels == Set(1L))
  }

  test("cluster labels: clique converges in one round to the minimum member") {
    import spark.implicits._
    val d = docs(1L -> "a", 2L -> "b", 3L -> "c", 7L -> "d")
    val clique = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(d, "doc_id", clique)
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L))
  }

  test("cluster representatives keep the best-quality member, not the min id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (9L, 0.1)).toDF("doc_id", "quality")
    val clique = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val reps = Dedup.clusterRepresentatives(d, "doc_id", clique, Seq(col("quality").desc))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reps == Set(2L, 9L), "cluster {1,2,3} keeps quality-0.9 doc 2; singleton 9 survives")
    // equal quality falls back to the doc-id tie-break
    val tied = Seq((1L, 0.5), (2L, 0.5)).toDF("doc_id", "quality")
    val tiedReps = Dedup.clusterRepresentatives(
      tied, "doc_id", Seq((1L, 2L)).toDF("id_a", "id_b"), Seq(col("quality").desc))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tiedReps == Set(1L))
  }

  test("null text keeps a signature: minhash/simhash treat it as empty string") {
    val d = docs(1L -> "hello world", 2L -> null, 3L -> null)
    val sigIds = Dedup.minHashSignatures(d, "doc_id", "text", numHashes = 8, shingleN = 2)
      .collect().map(_.getLong(0)).toSet
    assert(sigIds == Set(1L, 2L, 3L), "null-text docs must not vanish from the signature index")
    val simIds = Dedup.simHash(d, "doc_id", "text").collect().map(_.getLong(0)).toSet
    assert(simIds == Set(1L, 2L, 3L))
    // the two null-text docs are mutual duplicates under the '' coalescion
    val pairs = Dedup.simHashPairs(d, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L)))
  }

  test("minhash-LSH finds near-duplicates and skips distinct docs") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val nearDup = base.replace("tonight", "today")
    val other = "completely different content with no overlap whatsoever in any shingle at all"
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other, 4L -> base)
    val pairs = Dedup.minHashLshPairs(d, "doc_id", "text",
        numHashes = 32, shingleN = 2, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // identical
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup caught
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // distinct doc clean
  }

  test("simhash: identical docs at hamming 0; near-dups within band reach") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val d = docs(1L -> base, 2L -> base, 3L -> "unrelated words entirely disjoint vocabulary set")
    val pairs = Dedup.simHashPairs(d, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }

  test("verified minhash-LSH pairs equal the exact all-pairs jaccard answer") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.jaccardPairs(real, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e6))).toSet
    val verified = Dedup.minHashLshJaccardPairs(real, "doc_id", "text",
        numHashes = 32, shingleN = 3, bands = 16, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e6))).toSet
    assert(verified == exact,
      s"missed=${(exact -- verified).size} spurious=${(verified -- exact).size}")
  }

  test("simHashPairs60: banding is pigeonhole-complete vs brute-force hamming") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sigs = Dedup.simHash60(real, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val brute = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) if h <= 3
    } yield (sigs(i)._1, sigs(j)._1, h.toLong)).toSet
    val banded = Dedup.simHashPairs60(real, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"missed=${(brute -- banded).size} spurious=${(banded -- brute).size}")
  }

  test("minhash estimate tracks exact jaccard on sf0.001 documents") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.jaccardPairs(real, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val est = Dedup.minHashLshPairs(real, "doc_id", "text",
        numHashes = 32, shingleN = 3, bands = 8, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // high-similarity pairs must be recalled by the LSH path
    assert(exact.subsetOf(est) || (exact -- est).size <= exact.size / 10,
      s"LSH missed ${(exact -- est).size} of ${exact.size} exact pairs")
  }

  test("containment finds an excerpt inside a long doc where jaccard misses it") {
    val long = (1 to 100).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> long, 2L -> excerpt, 3L -> "totally different text here")
    val jac = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.5)
      .collect()
    assert(jac.isEmpty, "symmetric jaccard must miss the excerpt (8/98 shared trigrams)")
    val cont = Dedup.containmentPairs(d, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // excerpt (8 trigrams, all in doc 1) is contained; the reverse is not
    assert(cont.keySet == Set((2L, 1L)), s"got ${cont.keySet}")
    assert(cont((2L, 1L)) == 1.0)
  }

  test("containment: identical docs contain each other; direction respects sizes") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "a b c d e f g")
    val cont = Dedup.containmentPairs(d, "doc_id", "text", n = 3, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1 and 2 identical (3 trigrams each, mutual); both contained in 3
    // (whose 5 trigrams include all 3 of theirs); 3 contained in neither
    assert(cont == Set((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L)), s"got $cont")
  }

  test("incremental containment: batch excerpt flags against the corpus, both directions") {
    val corpus = docs(
      1L -> (1 to 100).map(i => s"w$i").mkString(" "),
      2L -> "unrelated corpus material entirely")
    // batch: an excerpt of corpus doc 1, and a long doc WRAPPING corpus doc 2
    val batch = docs(
      10L -> (1 to 10).map(i => s"w$i").mkString(" "),
      11L -> ("prefix words here unrelated corpus material entirely suffix words"))
    val got = Dedup.containmentPairsAgainst(batch, corpus, "doc_id", "text",
        n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == Set((10L, 1L), (11L, 2L)), s"got ${got.keySet}")
    val (cNew, _) = got((10L, 1L))
    assert(cNew == 1.0, "excerpt fully contained in its source")
    val (_, cCorp) = got((11L, 2L))
    assert(cCorp == 1.0, "wrapped corpus doc fully contained in the batch doc")
    // within-batch and within-corpus pairs are never emitted
    assert(!got.keySet.exists { case (a, b) => a < 100 && b < 100 && a < 10 })
  }

  test("cluster size histogram: hand-checked distribution incl. singletons") {
    val d = docs(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "y", 5L -> "y", 6L -> "z")
    val pairs = docs(1L -> "", 2L -> "").sparkSession.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, 2L), org.apache.spark.sql.Row(2L, 3L),
        org.apache.spark.sql.Row(4L, 5L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id_a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("id_b", org.apache.spark.sql.types.LongType))))
    val hist = Dedup.clusterSizeHistogram(
        Dedup.duplicateClusters(d.select("doc_id"), "doc_id", pairs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // clusters: {1,2,3} size 3, {4,5} size 2, {6} size 1
    assert(hist == Set((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)), s"got $hist")
  }
}
