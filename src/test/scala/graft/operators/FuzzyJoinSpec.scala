package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FuzzyJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def names(rows: Seq[(Long, String)], parts: Int = 4): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), parts),
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))))

  /** exhaustive O(n^2) reference the blocked join must reproduce */
  private def brute(df: DataFrame, maxDist: Int): Set[(Long, Long, Int)] = {
    val a = df.select(col("id").as("a_id"), col("name").as("a_name"))
    val b = df.select(col("id").as("b_id"), col("name").as("b_name"))
    a.crossJoin(b)
      .where(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .where(col("dist") <= lit(maxDist))
      .select("a_id", "b_id", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def blocked(df: DataFrame, maxDist: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.selfPairs(df, "id", "name", maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet

  test("deletionNeighborhood d=1 enumerates self plus single deletions") {
    val out = spark.range(1)
      .select(FuzzyJoin.deletionNeighborhood(lit("abc"), 1).as("v"))
      .head().getSeq[String](0).toSet
    assert(out == Set("abc", "bc", "ac", "ab"))
  }

  test("deletionNeighborhood handles empty and single-char strings") {
    val out = spark.range(1).select(
      FuzzyJoin.deletionNeighborhood(lit(""), 1).as("e"),
      FuzzyJoin.deletionNeighborhood(lit("x"), 2).as("s"))
    val r = out.head()
    assert(r.getSeq[String](0).toSet == Set(""))
    assert(r.getSeq[String](1).toSet == Set("x", ""))
  }

  test("d=1 pairs: substitution, insertion, deletion all found; d=2-only pair excluded") {
    val df = names(Seq(
      1L -> "kitten", 2L -> "mitten", // substitution, dist 1
      3L -> "kittens", // insertion vs 1, dist 1
      4L -> "kiten", // deletion vs 1, dist 1
      5L -> "sitting", // dist 3 from kitten
      6L -> "mittensX" // dist 2 from kittens
    ))
    val got = blocked(df, 1)
    assert(got == brute(df, 1))
    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((1L, 3L, 1)))
    assert(got.contains((1L, 4L, 1)))
    assert(!got.exists(p => p._1 == 3L && p._2 == 6L))
  }

  test("d=2 blocked == brute force, including transpositions (dist 2 in Levenshtein)") {
    val df = names(Seq(
      1L -> "abcdef", 2L -> "abdcef", // transposition = 2 edits
      3L -> "abcd", 4L -> "abcdxy", // two insertions
      5L -> "zzzzzz"
    ))
    assert(blocked(df, 2) == brute(df, 2))
    assert(blocked(df, 2).contains((1L, 2L, 2)))
  }

  test("differential vs brute force on a randomized perturbed corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh"
    val base = (0 until 40).map(i =>
      (0 until 6 + rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    // perturb half the strings by one random edit so dist-1 pairs exist
    val perturbed = base.zipWithIndex.map { case (s, i) =>
      if (i % 2 == 0) s
      else {
        val p = rnd.nextInt(s.length)
        rnd.nextInt(3) match {
          case 0 => s.updated(p, alphabet(rnd.nextInt(alphabet.length))) // sub
          case 1 => s.take(p) + s.drop(p + 1) // del
          case _ => s.take(p) + alphabet(rnd.nextInt(alphabet.length)) + s.drop(p) // ins
        }
      }
    }
    val df = names((base ++ perturbed).zipWithIndex.map { case (s, i) => (i.toLong, s) }, parts = 7)
    assert(blocked(df, 1) == brute(df, 1))
    assert(blocked(df, 2) == brute(df, 2))
    assert(blocked(df, 1).nonEmpty)
  }

  test("identical strings pair at dist 0 and duplicates don't explode the result") {
    val df = names(Seq(1L -> "same", 2L -> "same", 3L -> "same", 4L -> "other"))
    val got = blocked(df, 1)
    assert(got == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("two-table pairs variant matches the cross-table brute force") {
    val l = names(Seq(1L -> "alpha", 2L -> "beta"))
    val r = names(Seq(10L -> "alphq", 11L -> "betas", 12L -> "gamma"))
    val got = FuzzyJoin.pairs(l, r, "id", "name", 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(4))).toSet
    assert(got == Set((1L, 10L, 1), (2L, 11L, 1)))
  }

  test("plan has no cartesian product and shuffles no text in the candidate stage") {
    val df = names((0L to 50L).map(i => i -> s"name$i"))
    val plan = FuzzyJoin.selfPairs(df, "id", "name", 1)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("result is partitioning-independent") {
    val rows = (0L to 60L).map(i => i -> s"Customer#${1000 + i}")
    val a = blocked(names(rows, parts = 1), 1)
    val b = blocked(names(rows, parts = 13), 1)
    assert(a == b && a.nonEmpty)
  }
}
