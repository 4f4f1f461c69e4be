package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PathsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")
  private def seeds(ns: Long*) = ns.toDF("node")

  private def run(e: org.apache.spark.sql.DataFrame,
      s: org.apache.spark.sql.DataFrame, hops: Int): Map[Long, Int] =
    Paths.bfsDistances(e, "src", "dst", s, "node", maxHops = hops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("chain distances from one end are the hop indices") {
    val out = run(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), seeds(1L), 4)
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4), s"got $out")
  }

  test("maxHops truncates the frontier, not the distances already found") {
    val out = run(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), seeds(1L), 2)
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2), s"got $out")
  }

  test("multi-source takes the minimum hop count per node") {
    // sources at both chain ends: the middle node is 1 hop from each
    val out = run(edges(1L -> 2L, 2L -> 3L), seeds(1L, 3L), 4)
    assert(out == Map(1L -> 0, 3L -> 0, 2L -> 1), s"got $out")
  }

  test("unreached components are absent; isolated seeds stay at dist 0") {
    val out = run(edges(1L -> 2L, 10L -> 11L), seeds(1L, 99L), 4)
    assert(out == Map(1L -> 0, 2L -> 1, 99L -> 0), s"got $out")
  }

  test("direction, duplicate edges, and self-loops are normalized away") {
    val out = run(
      edges(2L -> 1L, 1L -> 2L, 2L -> 1L, 1L -> 1L, 2L -> 3L), seeds(1L), 4)
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2), s"got $out")
  }

  test("early-stopping loop equals a larger fixed hop budget once exhausted") {
    val g = edges(1L -> 2L, 2L -> 3L)
    assert(run(g, seeds(1L), 3) == run(g, seeds(1L), 30))
  }

  test("duplicate seed rows collapse to one dist-0 row") {
    val out = run(edges(1L -> 2L), seeds(1L, 1L, 1L), 1)
    assert(out == Map(1L -> 0, 2L -> 1), s"got $out")
  }

  // ---- randomWalks -------------------------------------------------------

  private def walks(e: org.apache.spark.sql.DataFrame, w: Int, steps: Int) =
    Paths.randomWalks(e, "src", "dst", walksPerNode = w, steps = steps)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))

  /** The operator's md5 neighbor choice, replicated independently. */
  private def md5Pick(start: Long, walk: Int, step: Int, cur: Long, deg: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$start|$walk|$step|$cur".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(8), 16) % deg).toInt
  }

  test("randomWalks: every transition replays the md5 choice over sorted neighbors") {
    val adj = Map(
      1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L), 3L -> Seq(1L, 2L, 4L), 4L -> Seq(3L))
    val out = walks(edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L), 2, 3)
    // hand-walk every (start, walk_no) with the independent replica
    val expected = adj.keys.flatMap { start =>
      (0 until 2).flatMap { w =>
        var cur = start
        (start, w, 0, cur) +: (1 to 3).map { t =>
          val ns = adj(cur)
          cur = ns(md5Pick(start, w, t, cur, ns.length))
          (start, w, t, cur)
        }
      }
    }.toSet
    assert(out.toSet == expected,
      s"walks diverged from the replica:\n got ${out.sorted.toSeq}\n exp ${expected.toSeq.sorted}")
  }

  test("randomWalks: shape — walksPerNode x (steps+1) rows per node, step 0 is the start") {
    val out = walks(edges(1L -> 2L, 2L -> 3L), 3, 2)
    assert(out.length == 3 * 3 * 3, s"got ${out.length} rows")
    assert(out.count(_._3 == 0) == 9, "one step-0 row per (node, walk)")
    assert(out.filter(_._3 == 0).forall(r => r._1 == r._4), "step 0 must be the start")
  }

  test("randomWalks: partitioning-independent bit for bit") {
    val e = (1L to 30L).flatMap(i => Seq(i -> (i % 30 + 1), i -> ((i + 7) % 30 + 1)))
      .toDF("src", "dst")
    val a = Paths.randomWalks(e.repartition(1), "src", "dst", 2, 3)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Paths.randomWalks(e.repartition(7), "src", "dst", 2, 3)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq, "walks drifted across partitionings")
  }

  test("randomWalksToSink: rows identical to union-mode, step-partitioned on disk") {
    val e = (1L to 25L).flatMap(i => Seq(i -> (i % 25 + 1), i -> ((i + 5) % 25 + 1)))
      .toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("walks_sink").toString
    val sink = Paths.randomWalksToSink(e, "src", "dst",
        walksPerNode = 2, steps = 3, path = dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    val union = walks(e, 2, 3).sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(sink == union, "sink-mode rows must equal union-mode rows")
    // the delivery contract: one parquet partition per step, so a
    // downstream window reader prunes to its step range
    val stepDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("step=")).map(_.getName).sorted.toSeq
    assert(stepDirs == Seq("step=0", "step=1", "step=2", "step=3"),
      s"got partitions $stepDirs")
    // partition pruning is real: a single-step read back returns
    // exactly that step's rows
    val s2 = spark.read.parquet(dir).where($"step" === 2).count()
    assert(s2 == union.count(_._3 == 2), "per-step read-back mismatch")
  }

  test("randomWalksToSink: stale partitions from a prior run never survive, " +
      "even under dynamic partition-overwrite semantics") {
    val e = edges(1L -> 2L, 2L -> 3L)
    val dir = java.nio.file.Files.createTempDirectory("walks_sink_stale").toString
    // a prior run's corpse at the same path: steps the new run won't
    // write (step=9) plus a poisoned row inside a step it will (step=1)
    Seq((99L, 0, 99L, 9), (99L, 0, 99L, 1))
      .toDF("start", "walk_no", "node", "step")
      .write.partitionBy("step").mode("overwrite").parquet(dir)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val got = Paths.randomWalksToSink(e, "src", "dst",
          walksPerNode = 1, steps = 2, path = dir)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      val union = walks(e, 1, 2).sortBy(t => (t._1, t._2, t._3)).toSeq
      assert(got == union,
        s"stale sink rows leaked into the read-back:\n got $got\n exp $union")
      val stepDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("step=")).map(_.getName).sorted.toSeq
      assert(stepDirs == Seq("step=0", "step=1", "step=2"),
        s"prior-run partitions must be gone, got $stepDirs")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  // ---- walkSkipgramPairs ---------------------------------------------------

  test("walkSkipgramPairs: counts match a hand fold over the walk corpus, " +
      "and the scan prunes step partitions") {
    val e = (1L to 20L).flatMap(i => Seq(i -> (i % 20 + 1), i -> ((i + 3) % 20 + 1)))
      .toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("walks_sg").toString
    Paths.randomWalksToSink(e, "src", "dst", walksPerNode = 2, steps = 4, path = dir)
    val corpus = walks(e, 2, 4).toSeq // (start, walk_no, step, node)
    // hand fold: all same-walk position pairs within window 2
    val byWalk = corpus.groupBy(r => (r._1, r._2))
    val expected = byWalk.values.flatMap { ps =>
      for {
        c <- ps; x <- ps
        if c._3 != x._3 && math.abs(c._3 - x._3) <= 2
      } yield (c._4, x._4)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val full = Paths.walkSkipgramPairs(spark, dir, window = 2,
      centerLo = 0, centerHi = 4)
    val got = full.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"pair counts diverged from the hand fold")
    // restricted center range reads only [t-w, t+w]: the scan must carry
    // a partition filter, and the result must equal the hand fold's
    // center-restricted slice
    val one = Paths.walkSkipgramPairs(spark, dir, window = 1,
      centerLo = 2, centerHi = 2)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("step"),
      s"the sink read must prune step partitions:\n$plan")
    val expOne = byWalk.values.flatMap { ps =>
      for {
        c <- ps; x <- ps
        if c._3 == 2 && x._3 != 2 && math.abs(x._3 - 2) <= 1
      } yield (c._4, x._4)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val gotOne = one.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotOne == expOne, "center-restricted pairs diverged")
  }

  // ---- randomWalksBiased ---------------------------------------------------

  /** Independent replica of the biased interval pick. */
  private def biasedReplica(
      adj: Map[Long, Seq[Long]], und: Set[(Long, Long)],
      walksPerNode: Int, steps: Int,
      wr: Long, wc: Long, wo: Long): Set[(Long, Int, Int, Long)] = {
    def md5Mod(start: Long, walk: Int, step: Int, cur: Long, m: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$start|$walk|$step|$cur".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % m
    }
    def hasEdge(a: Long, b: Long) = und.contains((math.min(a, b), math.max(a, b)))
    adj.keys.flatMap { start =>
      (0 until walksPerNode).flatMap { w =>
        var prev = start
        var cur = start
        (start, w, 0, cur) +: (1 to steps).map { t =>
          val ns = adj(cur)
          val nxt = if (t == 1) ns(md5Mod(start, w, 1, cur, ns.length).toInt)
          else {
            val wts = ns.map { x =>
              if (x == prev) wr else if (hasEdge(x, prev)) wc else wo
            }
            val r = md5Mod(start, w, t, cur, wts.sum)
            val cums = wts.scanLeft(0L)(_ + _).tail
            ns(cums.indexWhere(r < _))
          }
          prev = cur; cur = nxt
          (start, w, t, cur)
        }
      }
    }.toSet
  }

  test("randomWalksBiased: every transition replays the weighted interval pick") {
    // a graph with real 2nd-order structure: a square with one diagonal
    // (1-2, 2-3, 3-4, 4-1, 1-3) plus a pendant 5 on 4
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L, 4L -> 5L)
    val adj = Map(
      1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L, 3L), 3L -> Seq(1L, 2L, 4L),
      4L -> Seq(1L, 3L, 5L), 5L -> Seq(4L))
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val out = Paths.randomWalksBiased(es.toDF("src", "dst"), "src", "dst",
        walksPerNode = 2, steps = 4, wReturn = 4, wCommon = 2, wOut = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val expected = biasedReplica(adj, und, 2, 4, 4L, 2L, 1L)
    assert(out == expected,
      s"biased walks diverged from the replica:\n got ${out.toSeq.sorted}\n exp ${expected.toSeq.sorted}")
  }

  test("randomWalksBiased: shape and partitioning independence") {
    val e = (1L to 24L).flatMap(i => Seq(i -> (i % 24 + 1), i -> ((i + 5) % 24 + 1)))
      .toDF("src", "dst")
    val a = Paths.randomWalksBiased(e.repartition(1), "src", "dst", 2, 3, 3, 2, 1)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Paths.randomWalksBiased(e.repartition(7), "src", "dst", 2, 3, 3, 2, 1)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq, "biased walks drifted across partitionings")
    assert(a.length == 24 * 2 * 4, s"got ${a.length} rows")
  }

  test("randomWalksBiasedToSink: rows identical to union mode, stale sink cleared") {
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L)
    val dir = java.nio.file.Files.createTempDirectory("walks_biased_sink").toString
    // plant a stale corpse the run must clear
    Seq((99L, 0, 99L, 9)).toDF("start", "walk_no", "node", "step")
      .write.partitionBy("step").mode("overwrite").parquet(dir)
    val sink = Paths.randomWalksBiasedToSink(es.toDF("src", "dst"), "src", "dst",
        walksPerNode = 2, steps = 3, wReturn = 4, wCommon = 2, wOut = 1, path = dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    val union = Paths.randomWalksBiased(es.toDF("src", "dst"), "src", "dst",
        walksPerNode = 2, steps = 3, wReturn = 4, wCommon = 2, wOut = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(sink == union, "sink-mode biased rows must equal union-mode rows")
    assert(!sink.exists(_._1 == 99L), "stale rows must be gone")
  }

  // ---- skip-gram node embeddings -------------------------------------------

  private def sgPairs(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("center", "context", "n_pairs")
  }

  /** Independent replica of the md5 projection weight w(context, j). */
  private def projWeight(context: Long, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${context}_$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16).toDouble / 576460752303423488.0 - 1.0
  }

  test("skipgramNodeEmbeddings replays PPMI + projection hand computation") {
    // counts: (1,2)=4, (1,3)=1, (2,2)=1 -> N=6
    val pairs = sgPairs((1L, 2L, 4L), (1L, 3L, 1L), (2L, 2L, 1L))
    val dim = 4
    val out = Paths.skipgramNodeEmbeddings(pairs, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // independent replica
    val n = Map((1L, 2L) -> 4L, (1L, 3L) -> 1L, (2L, 2L) -> 1L)
    val nN = 6L
    val nc = Map(1L -> 5L, 2L -> 1L)
    val nx = Map(2L -> 5L, 3L -> 1L)
    val ppmiQ = n.map { case ((c, x), v) =>
      (c, x) -> math.max(0L,
        math.floor(math.log((v.toDouble * nN) / (nc(c).toDouble * nx(x))) * 1e9).toLong)
    }.filter(_._2 > 0L)
    assert(ppmiQ.keySet == Set((1L, 3L), (2L, 2L)),
      s"(1,2) has PMI ln(24/25) < 0 and must drop; got $ppmiQ")
    val expected = (for {
      ((c, x), pq) <- ppmiQ.toSeq
      j <- 0 until dim
    } yield (c, j.toLong) ->
      math.floor(((pq.toDouble / 1e9) * projWeight(x, j)) * 1e6).toLong)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum / 1e6 }
    assert(out.keySet == expected.keySet)
    expected.foreach { case (k, v) =>
      assert(out(k) == v, s"component $k: ${out(k)} vs $v")
    }
  }

  test("skipgramNodeEmbeddings: uniform co-occurrence has no positive PPMI") {
    // every (c, x) cell equal -> PMI = ln(1) = 0 everywhere -> empty output
    val pairs = sgPairs((1L, 1L, 2L), (1L, 2L, 2L), (2L, 1L, 2L), (2L, 2L, 2L))
    assert(Paths.skipgramNodeEmbeddings(pairs, 4).collect().isEmpty)
  }

  test("skipgramNodeEmbeddings is partitioning-independent bit for bit") {
    val rows = (1L to 20L).flatMap(c => (1L to 5L).map(x => (c, x, (c * x) % 7 + 1)))
    val a = Paths.skipgramNodeEmbeddings(sgPairs(rows: _*), 8)
      .orderBy("node", "j").collect().toSeq
    val b = Paths.skipgramNodeEmbeddings(sgPairs(rows: _*).repartition(13), 8)
      .orderBy("node", "j").collect().toSeq
    assert(a == b)
  }

  test("skipgramNodeEmbeddings: similar context rows get similar embeddings") {
    // nodes 1 and 2 share context profile; node 3 is disjoint
    val pairs = sgPairs(
      (1L, 10L, 6L), (1L, 11L, 1L),
      (2L, 10L, 6L), (2L, 11L, 1L),
      (3L, 20L, 6L), (3L, 21L, 1L))
    val emb = Paths.skipgramNodeEmbeddings(pairs, 16)
      .collect().groupBy(_.getLong(0)).map { case (node, rs) =>
        node -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq
      }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(cos(emb(1L), emb(2L)) > 0.999, "identical context rows -> identical embeddings")
    assert(cos(emb(1L), emb(3L)) < 0.9, "disjoint context rows stay apart")
  }

  test("skipgramNodeEmbeddings dim bounds fail loudly") {
    intercept[IllegalArgumentException] {
      Paths.skipgramNodeEmbeddings(sgPairs((1L, 2L, 1L)), 1)
    }
    intercept[IllegalArgumentException] {
      Paths.skipgramNodeEmbeddings(sgPairs((1L, 2L, 1L)), 300)
    }
  }
}
