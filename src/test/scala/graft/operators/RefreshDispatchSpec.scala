package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The community-refresh front door ([[Communities.communityRefreshAuto]])
  * — the WidthDispatchSpec pattern applied to refresh strategy: the
  * ball-fraction boundary is walked from BOTH sides on the same graph,
  * and each side's output is pinned to the branch it must have taken
  * (the two branches' outputs genuinely differ under non-converged
  * seeds, so equality identifies the branch).
  */
class RefreshDispatchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")
  private def nodesDf(ns: Long*) = ns.toDF("node")
  private def seedsDf(rows: (Long, Long)*) = rows.toDF("node", "label")
  private def toMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // chain 1-2-...-10: bounded-diameter, so a small-hop ball around one
  // dirty node covers a controllable fraction; marker seeds (100+i) are
  // deliberately NON-converged so the frozen-outside-the-ball local
  // semantic and the re-vote-everything full semantic disagree
  private val chain = edges((1L to 9L).map(i => i -> (i + 1)): _*)
  private lazy val standingAdj = Communities.lpaAdjacency(chain, "src", "dst")
    .localCheckpoint(true)
  private val markerSeeds = seedsDf((1L to 10L).map(i => i -> (100L + i)): _*)
  // batch re-sends an already-standing edge: no new nodes, no delta —
  // the graph under refresh IS the chain (10 nodes)
  private val noopBatch = edges(1L -> 2L)

  test("small ball dispatches LOCAL: output equals labelPropagationLocalOnAdj " +
      "and differs from the full seeded refresh") {
    // dirty = {1}, hops = 1 -> ball = {1, 2}: fraction 0.2
    val auto = toMap(Communities.communityRefreshAuto(
      standingAdj, noopBatch, "src", "dst", markerSeeds, nodesDf(1L),
      hops = 1, iterations = 1))
    val local = toMap(Communities.labelPropagationLocalOnAdj(
      standingAdj, noopBatch, "src", "dst", markerSeeds, nodesDf(1L),
      hops = 1, iterations = 1))
    val full = toMap(Communities.labelPropagationFromOnAdj(
      standingAdj, noopBatch, "src", "dst", markerSeeds, iterations = 1))
    assert(auto == local, s"auto must take the local branch:\n $auto\n vs $local")
    assert(auto != full,
      "branches must be distinguishable here or the dispatch is unverified")
    // and the local semantic itself: nodes outside ball keep markers
    (3L to 10L).foreach(n => assert(auto(n) == 100L + n, s"node $n moved: $auto"))
  }

  test("large ball dispatches FULL: output equals labelPropagationFromOnAdj " +
      "and differs from the localized refresh") {
    // dirty = {1}, hops = 5 -> ball = {1..6}: fraction 0.6 > default 0.5
    val auto = toMap(Communities.communityRefreshAuto(
      standingAdj, noopBatch, "src", "dst", markerSeeds, nodesDf(1L),
      hops = 5, iterations = 1))
    val local = toMap(Communities.labelPropagationLocalOnAdj(
      standingAdj, noopBatch, "src", "dst", markerSeeds, nodesDf(1L),
      hops = 5, iterations = 1))
    val full = toMap(Communities.labelPropagationFromOnAdj(
      standingAdj, noopBatch, "src", "dst", markerSeeds, iterations = 1))
    assert(auto == full, s"auto must take the full branch:\n $auto\n vs $full")
    assert(auto != local,
      "branches must be distinguishable here or the dispatch is unverified")
  }

  test("the boundary is walked from both sides by the threshold alone") {
    // same ball (6 of 10 nodes = 0.6); only maxLocalBallFraction moves
    def auto(th: Double) = toMap(Communities.communityRefreshAuto(
      standingAdj, noopBatch, "src", "dst", markerSeeds, nodesDf(1L),
      hops = 5, iterations = 1, maxLocalBallFraction = th))
    val local = toMap(Communities.labelPropagationLocalOnAdj(
      standingAdj, noopBatch, "src", "dst", markerSeeds, nodesDf(1L),
      hops = 5, iterations = 1))
    val full = toMap(Communities.labelPropagationFromOnAdj(
      standingAdj, noopBatch, "src", "dst", markerSeeds, iterations = 1))
    assert(auto(0.65) == local, "0.6 <= 0.65 must stay local")
    assert(auto(0.55) == full, "0.6 > 0.55 must go full")
  }

  test("batch with genuinely new nodes: auto (local side) handles the delta " +
      "like labelPropagationLocalOnAdj") {
    val batch = edges(1L -> 20L, 20L -> 21L)
    val dirty = nodesDf(1L, 20L, 21L)
    val auto = toMap(Communities.communityRefreshAuto(
      standingAdj, batch, "src", "dst", markerSeeds, dirty,
      hops = 1, iterations = 2))
    val local = toMap(Communities.labelPropagationLocalOnAdj(
      standingAdj, batch, "src", "dst", markerSeeds, dirty,
      hops = 1, iterations = 2))
    assert(auto == local, s"delta handling diverged:\n $auto\n vs $local")
    assert(auto.keySet == (1L to 10L).toSet + 20L + 21L,
      s"new nodes must be labeled, standing nodes kept: ${auto.keySet}")
  }

  test("a batch that only re-sends standing edges with an out-of-graph dirty " +
      "set returns the seeds verbatim (empty ball, local branch)") {
    val auto = toMap(Communities.communityRefreshAuto(
      standingAdj, noopBatch, "src", "dst", markerSeeds, nodesDf(999L),
      hops = 2, iterations = 2))
    assert(auto == (1L to 10L).map(i => i -> (100L + i)).toMap,
      s"nothing dirty in-graph must change nothing: $auto")
  }

  test("string node ids dispatch and refresh like longs, and a re-sent " +
      "standing pair cannot double a vote (driver-resident delta dedups by value)") {
    import spark.implicits._
    val sChain = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val sAdj = Communities.lpaAdjacency(sChain, "src", "dst")
    // seeds chosen so a DOUBLE-COUNTED (a,b) edge would flip b's vote:
    // correct votes at b are {w3 (a), w1 (self), w2 (c)} — a 3-way tie
    // won by "w1"; a duplicated edge makes it {w3 x2, ...} -> "w3"
    val sSeeds = Seq("a" -> "w3", "b" -> "w1", "c" -> "w2", "d" -> "w4",
      "e" -> "w5").toDF("node", "label")
    val batch = Seq(("a", "b")).toDF("src", "dst") // already standing
    val dirty = Seq("a").toDF("node") // ball(1 hop) = {a, b}: 0.4 of 5
    val auto = Communities.communityRefreshAuto(
        sAdj, batch, "src", "dst", sSeeds, dirty, hops = 1, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val local = Communities.labelPropagationLocalOnAdj(
        sAdj, batch, "src", "dst", sSeeds, dirty, hops = 1, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(auto == local, s"string-id dispatch diverged:\n $auto\n vs $local")
    assert(auto("b") == "w1", s"duplicate pair double-counted a vote: $auto")
    // outside the ball: seeds verbatim
    assert(auto("c") == "w2" && auto("d") == "w4" && auto("e") == "w5",
      s"frozen nodes moved: $auto")
  }

  test("an int-typed batch against a long-typed standing adjacency coerces " +
      "to the standing type (a re-sent standing pair stays a no-op)") {
    // r18 ADVICE: before the cast, the driver-side probe compared
    // Int != Long and a re-sent standing edge counted as NEW — here
    // that would re-vote node 2 off its marker seed
    val intBatch = Seq((1, 2)).toDF("src", "dst") // IntegerType columns
    val auto = toMap(Communities.communityRefreshAuto(
      standingAdj, intBatch, "src", "dst", markerSeeds, nodesDf(999L),
      hops = 2, iterations = 2))
    assert(auto == (1L to 10L).map(i => i -> (100L + i)).toMap,
      s"int batch of a standing pair must change nothing: $auto")
  }

  test("non-allowlisted node id types refuse loudly (decimal ids)") {
    import org.apache.spark.sql.functions.col
    val decAdj = standingAdj.select(
      col("node").cast("decimal(10,2)").as("node"),
      col("nbr").cast("decimal(10,2)").as("nbr"))
    val e = intercept[IllegalArgumentException] {
      Communities.communityRefreshAuto(
        decAdj, noopBatch, "src", "dst",
        markerSeeds.select(col("node").cast("decimal(10,2)").as("node"),
          col("label")),
        nodesDf(1L), hops = 1, iterations = 1)
    }
    assert(e.getMessage.contains("long/int/string"), e.getMessage)
  }

  test("labelPropagationFromOnAdj equals labelPropagationFrom on the union " +
      "graph (persisted adjacency, duplicate batch edges deduplicated)") {
    val rnd = new scala.util.Random(83)
    val es = (1 to 300).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    val standing = edges(es: _*)
    val seeds = Communities.labelPropagation(standing, "src", "dst", iterations = 4)
    val batch = edges(200L -> 201L, 5L -> 200L, 7L -> 11L, es.head)
    val viaAdj = toMap(Communities.labelPropagationFromOnAdj(
      Communities.lpaAdjacency(standing, "src", "dst"),
      batch, "src", "dst", seeds, iterations = 3))
    val direct = toMap(Communities.labelPropagationFrom(
      standing.unionByName(batch), "src", "dst", seeds, iterations = 3))
    assert(viaAdj == direct,
      s"persisted-adjacency full refresh diverged:\n $viaAdj\n vs $direct")
  }
}
