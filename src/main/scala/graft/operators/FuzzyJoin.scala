package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity join — the entity-resolution
  * primitive: find every pair of strings within `maxDist` edits without a
  * cartesian product.
  *
  * Candidate generation is the FastSS deletion-neighborhood scheme (Bocek
  * et al., "Fast Similarity Search in Large Dictionaries", 2007 — public
  * tech report): if `ed(a, b) <= d`, then deleting the <= d error positions
  * from each side yields a common string, so the neighborhoods
  * `D_<=d(a)` and `D_<=d(b)` (all strings reachable by deleting up to `d`
  * characters) intersect. Candidates = pairs sharing any neighborhood
  * member; an exact `levenshtein` check makes the result precise. Unlike
  * q-gram count filtering or pigeonhole segmenting, the blocking key is a
  * near-complete string, so a shared constant prefix/suffix across the
  * corpus (e.g. `Customer#00000...`) does NOT collapse the index into one
  * hot bucket — bucket sizes track true edit-neighborhood sizes.
  *
  * Scale shape for a 100 TB corpus of short keys (names, titles, ids):
  *   - the index is `(xxhash64(variant), id)` long pairs — `O(L^d)` rows
  *     per string (L+1 for d=1), NO text carried through any shuffle;
  *     hash collisions only add candidates, verification removes them;
  *   - the candidate join is a plain equi-join on the variant hash,
  *     deduplicated to id pairs BEFORE strings are joined back, so each
  *     surviving pair runs `levenshtein` exactly once;
  *   - strings re-attach via two id-keyed equi-joins (broadcast-able when
  *     the name table is small; hash join otherwise).
  *
  * `maxDist` is bounded to 1 or 2: the neighborhood is `O(L^d)` and the
  * FastSS index degenerates past that — for looser thresholds use the
  * n-gram Jaccard operator ([[Dedup.jaccardPairs]]) instead.
  */
object FuzzyJoin {

  /** All strings reachable from `s` by deleting up to `maxDist`
    * characters (including `s` itself), as a distinct array column.
    * Computed fully in-plan with array HOFs — no UDF. */
  def deletionNeighborhood(s: Column, maxDist: Int): Column = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2, got $maxDist")
    var frontier = array(s) // exactly k deletions so far
    var all = array(s)
    for (_ <- 1 to maxDist) {
      frontier = array_distinct(flatten(transform(frontier, v => deleteOneAll(v))))
      all = array_distinct(concat(all, frontier))
    }
    all
  }

  /** Every cross-table pair within `maxDist` edits:
    * `(a_id, b_id, a_str, b_str, dist)` (output columns named after the
    * input id/string columns, prefixed `a_`/`b_`). Exact — candidate
    * superset by the FastSS lemma, `levenshtein` verify. */
  def pairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int = 1
  ): DataFrame =
    verified(candidates(left, right, idCol, strCol, maxDist, selfPairs = false),
      left, right, idCol, strCol, maxDist)

  /** Every within-table pair within `maxDist` edits, each pair once
    * (`a_id < b_id`). Same output shape as [[pairs]]. */
  def selfPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int = 1
  ): DataFrame =
    verified(candidates(df, df, idCol, strCol, maxDist, selfPairs = true),
      df, df, idCol, strCol, maxDist)

  /** Deduplicated candidate id pairs sharing a deletion-neighborhood
    * member. Index rows are (hash, id[, pos]) longs only — text never
    * shuffles.
    *
    * `maxDist = 1` applies the FastSS POSITIONAL refinement: a true
    * distance-<=1 pair always matches either at the SAME deletion
    * position (substitution at p -> both delete p; identity -> both
    * full) or with one side's full string (indel -> the longer side
    * deletes the inserted char, the shorter side is untouched), so
    * candidates with incompatible positions — which are exactly the
    * distance-2 pairs the plain variant join admits — are pruned
    * map-side BEFORE the distinct-pair exchange. Measured on the
    * 1.5M-name scaling corpus this cut the candidate volume ~8x and
    * restored the linear curve (SCALING.md). `maxDist = 2` keeps the
    * plain neighborhood join (position algebra for multi-deletion
    * variants buys less and costs sorted-list compares). */
  private def candidates(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      selfPairs: Boolean
  ): DataFrame = {
    val joined = if (maxDist == 1) {
      def index(df: DataFrame, side: String): DataFrame = {
        val base = df.where(col(strCol).isNotNull)
        val full = base.select(col(idCol).as(s"${side}_id"),
          xxhash64(col(strCol)).as(s"${side}_vh"), lit(-1).as(s"${side}_p"))
        val dels = base
          .select(col(idCol).as(s"${side}_id"),
            posexplode(deleteOneAll(col(strCol))).as(Seq(s"${side}_p", "__v")))
          .select(col(s"${side}_id"), xxhash64(col("__v")).as(s"${side}_vh"),
            col(s"${side}_p"))
        full.unionByName(dels)
      }
      index(left, "a").join(index(right, "b"),
        col("a_vh") === col("b_vh") &&
          (col("a_p") === col("b_p") || col("a_p") === -1 || col("b_p") === -1))
    } else {
      def index(df: DataFrame, side: String): DataFrame =
        df.where(col(strCol).isNotNull)
          .select(col(idCol).as(s"${side}_id"),
            explode(deletionNeighborhood(col(strCol), maxDist)).as("__v"))
          .select(col(s"${side}_id"), xxhash64(col("__v")).as(s"${side}_vh"))
      index(left, "a").join(index(right, "b"), col("a_vh") === col("b_vh"))
    }
    val filtered =
      if (selfPairs) joined.where(col("a_id") < col("b_id")) else joined
    filtered.select("a_id", "b_id").distinct()
  }

  /** All single-deletion variants of `s` in position order (index i =
    * delete character i); empty array for the empty string. */
  private def deleteOneAll(s: Column): Column =
    when(length(s) > 0,
      transform(sequence(lit(0), length(s) - lit(1)),
        i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s)))))
      .otherwise(array().cast("array<string>"))

  private def verified(
      cand: DataFrame,
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int
  ): DataFrame = {
    val aStr = s"a_$strCol"
    val bStr = s"b_$strCol"
    val la = left.select(col(idCol).as("a_id"), col(strCol).as(aStr))
    val rb = right.select(col(idCol).as("b_id"), col(strCol).as(bStr))
    cand
      .join(la, "a_id")
      .join(rb, "b_id")
      .withColumn("dist", levenshtein(col(aStr), col(bStr)))
      .where(col("dist") <= lit(maxDist))
      .select(col("a_id").as(s"a_$idCol"), col("b_id").as(s"b_$idCol"),
        col(aStr), col(bStr), col("dist"))
  }
}
