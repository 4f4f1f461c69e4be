package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChunkingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("chunking: stride windows with overlap cover every token") {
    val d = docs(1L -> (1 to 10).map(i => s"t$i").mkString(" "))
    val out = Chunking.chunk(d, "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
      .collect().map(r => r.getInt(1) -> (r.getString(2), r.getInt(3))).toMap
    // stride 3, nChunks = ceil((10-1)/3) = 3: windows at 0, 3, 6
    assert(out == Map(
      0 -> ("t1 t2 t3 t4", 4),
      1 -> ("t4 t5 t6 t7", 4), // overlap of 1 repeats the boundary token
      2 -> ("t7 t8 t9 t10", 4)))
  }

  test("chunking: no pure-overlap tail window (it would duplicate content)") {
    // n=5, chunk 4, overlap 2 (stride 2): ceil(n/stride) would emit a
    // third window holding only t5 — a strict subset of window 1
    val d = docs(1L -> "t1 t2 t3 t4 t5")
    val out = Chunking.chunk(d, "doc_id", "text", chunkTokens = 4, overlapTokens = 2)
      .collect().map(r => r.getInt(1) -> r.getString(2)).toMap
    assert(out == Map(0 -> "t1 t2 t3 t4", 1 -> "t3 t4 t5"))
    // a doc shorter than the chunk is exactly one whole-doc chunk
    val tiny = Chunking.chunk(docs(2L -> "a b"), "doc_id", "text", 64, 16)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(tiny.toSeq == Seq((0, "a b", 2)))
  }

  test("chunking: empty docs yield zero chunks; exact multiples no phantom window") {
    val d = docs(1L -> "", 2L -> "   ", 3L -> "a b c d e f")
    val rows = Chunking.chunk(d, "doc_id", "text", chunkTokens = 3, overlapTokens = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.toSet == Set((3L, 0), (3L, 1)), s"got ${rows.toSeq}")
  }

  test("hash sampling is deterministic and close to the rate") {
    val ids = docs((1L to 2000L).map(i => i -> s"doc $i"): _*)
    val a = Chunking.sampleByHash(ids, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Chunking.sampleByHash(ids, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    assert(a == b, "same rows must survive every run")
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"rate drifted: ${a.size / 2000.0}")
    // monotone: a higher rate strictly contains a lower one
    val wider = Chunking.sampleByHash(ids, "doc_id", 0.6).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider), "threshold sampling must be monotone in the rate")
  }

  test("mixture sampling applies per-stratum rates and drops unmapped strata") {
    import spark.implicits._
    val d = (1L to 300L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
    val out = Chunking.mixtureSample(d, "doc_id", "lang", Map("en" -> 1.0, "de" -> 0.0))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.forall(_._2 == "en"), "rate-0 and unmapped strata must vanish")
    assert(out.length == 100, "rate 1.0 keeps the whole stratum")
  }

  test("mixture upsampling: rate 2.25 yields 2 or 3 deterministic copies per row") {
    import spark.implicits._
    val d = (1L to 600L).map(i => (i, if (i % 2 == 0) "de" else "en")).toDF("doc_id", "lang")
    val out = Chunking.mixtureSample(d, "doc_id", "lang", Map("de" -> 2.25, "en" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap

    val de = byId.filter { case (id, _) => id % 2 == 0 }
    assert(de.values.forall(c => c == Seq(0, 1) || c == Seq(0, 1, 2)),
      "every German doc gets exactly 2 or 3 copies, indexed 0..n-1")
    // the fractional third copy uses the SAME hash threshold as plain
    // downsampling at 0.25 — the upweighted set is the downsample's set
    val thirdCopy = de.filter(_._2.size == 3).keySet
    val quarter = Chunking.sampleByHash(d.where($"lang" === "de"), "doc_id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(thirdCopy == quarter, "fractional copies must reuse the hash-sample decision")
    val frac = thirdCopy.size.toDouble / de.size
    assert(math.abs(frac - 0.25) < 0.07, s"third-copy fraction drifted: $frac")

    // r <= 1 keeps pure-filter semantics: single copies, same survivors
    val en = byId.filter { case (id, _) => id % 2 == 1 }
    assert(en.values.forall(_ == Seq(0)), "downsampled rows never duplicate")
    val half = Chunking.sampleByHash(d.where($"lang" === "en"), "doc_id", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(en.keySet == half, "rate <= 1 must reproduce sampleByHash row for row")

    // and the whole thing is a pure function of (id, stratum)
    val again = Chunking.mixtureSample(d, "doc_id", "lang", Map("de" -> 2.25, "en" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq, "mixture must be reproducible")
  }

  test("temperature weights: sqrt-smoothed integer micro ratios, hand-checked") {
    import spark.implicits._
    // strata sizes 100 / 400 / 900 -> sqrt scores 10 / 20 / 30 (exact),
    // micro scores 1e7 / 2e7 / 3e7, total 6e7 ->
    // weights floor(s * 1e6 / 6e7) = 166666 / 333333 / 500000
    val d = ((1 to 100).map(_ => "a") ++ (1 to 400).map(_ => "b") ++
      (1 to 900).map(_ => "c")).toDF("src")
    val got = Chunking.temperatureWeights(d, "src")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 100L, 166666L), ("b", 400L, 333333L), ("c", 900L, 500000L)),
      s"got $got")
    // alpha = 1 reproduces natural proportions
    val nat = Chunking.temperatureWeights(d, "src", alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(nat("a") == 71428L && nat("b") == 285714L && nat("c") == 642857L, s"got $nat")
    // partitioning-independent (integer contract)
    val got13 = Chunking.temperatureWeights(d.repartition(13), "src")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got13 == got)

    // invariant: weights sum to 1e6 minus at most (#strata - 1) floor
    // deficit, never over
    for (alpha <- Seq(0.5, 0.3, 1.0)) {
      val ws = Chunking.temperatureWeights(d, "src", alpha)
        .collect().map(_.getLong(2))
      assert(ws.sum <= 1000000L && ws.sum > 1000000L - ws.length,
        s"alpha=$alpha sum=${ws.sum}")
      assert(ws.forall(w => w > 0 && w < 1000000L), s"alpha=$alpha ws=${ws.toSeq}")
    }
  }
}
