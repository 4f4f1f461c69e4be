package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RpSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("matrix is deterministic, right-shaped, and Achlioptas-sparse") {
    val m1 = Similarity.randomProjectionMatrix(64, 16, seed = 7L)
    val m2 = Similarity.randomProjectionMatrix(64, 16, seed = 7L)
    assert(m1 == m2, "same seed must give the same matrix")
    assert(m1.size == 16 && m1.forall(_.size == 64))
    val entries = m1.flatten
    val scale = math.sqrt(3.0 / 16)
    assert(entries.forall(e => e == 0.0 || math.abs(math.abs(e) - scale) < 1e-12))
    // ~2/3 zeros (binomial n=1024 p=2/3: accept a wide band)
    val zeroFrac = entries.count(_ == 0.0).toDouble / entries.size
    assert(zeroFrac > 0.55 && zeroFrac < 0.78, s"zero fraction $zeroFrac")
    assert(Similarity.randomProjectionMatrix(64, 16, seed = 8L) != m1,
      "different seed must change the matrix")
  }

  test("projectColumn matches the driver-side matrix multiply") {
    val m = Similarity.randomProjectionMatrix(4, 3, seed = 1L)
    val vec = Seq(1.0, -2.0, 0.5, 3.0)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(vec.toArray)), 1),
      StructType(Seq(StructField("v", ArrayType(DoubleType)))))
    val got = df.select(Similarity.projectColumn(col("v"), m).as("p"))
      .head().getSeq[Double](0)
    val want = m.map(row => row.zip(vec).map { case (a, b) => a * b }.sum)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("JL preserves the planted-twin gap: projected cosine separates twins from noise") {
    // the testdata shape: deterministic pseudo-random unit-scale vectors
    // (pairwise cosine near 0) plus near-identical planted twins
    val dim = 64
    def vec(id: Long): Array[Double] = {
      val r = new scala.util.Random(id)
      Array.fill(dim)(r.nextDouble() - 0.5)
    }
    val rows = (0L until 40L).map(i => Row(i, vec(i))) :+ Row(1000L, vec(0L).map(_ * 1.02))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("id", LongType), StructField("v", ArrayType(DoubleType)))))
    val m = Similarity.randomProjectionMatrix(dim, 16)
    val proj = df.select(col("id"), Similarity.projectColumn(col("v"), m).as("p"))
    val q = proj.where(col("id") === 0L).select(col("p").as("q")).crossJoin(
      proj.where(col("id") =!= 0L))
    val scored = q.select(col("id"), Similarity.cosine(col("p"), col("q")).as("c"))
      .orderBy(desc("c")).collect()
    assert(scored.head.getLong(0) == 1000L,
      s"projected twin must rank first, got ${scored.head}")
    assert(scored.head.getDouble(1) > 0.9, "twin projected cosine should stay high")
  }

  test("rpTopKForQueries matches exact topKForQueries on the planted sf0.01 AND " +
    "sf0.1 corpora (the rp_ann_topk entry's DuckDB-oracle precondition)") {
    Seq("sf0.01", "sf0.1").foreach { sf =>
      val base = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      // the catalog's plantedEmbeddings recipe: vec_id < 100 gets a twin
      // at +1000000 with elements scaled 1.02/0.98 through a float cast
      val twins = base.where(col("vec_id") < 100).select(
        (col("vec_id").cast("long") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * when(pmod(i, lit(2)) === 0, lit(1.02)).otherwise(lit(0.98)))
            .cast("float")).as("embedding"))
      val e = base.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
        .unionByName(twins)
      val queries = e.where(col("vec_id") < 5)
      val exact = Similarity.topKForQueries(e, queries, "vec_id", "embedding", k = 1)
        .select("query_id", "corpus_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val rp = Similarity.rpTopKForQueries(e, queries, "vec_id", "embedding",
        outDim = 16, candidateK = 32, k = 1)
        .select("query_id", "corpus_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(rp == exact,
        s"[$sf] rp candidate stage missed exact neighbors: ${exact -- rp}")
      // and each query's top-1 really is its planted twin — the regime check
      assert(exact == (0L until 5L).map(q => (q, q + 1000000L, 1)).toSet,
        s"[$sf] planted regime broken: $exact")
    }
  }

  test("candidateK >= k is enforced") {
    val e = spark.range(1).selectExpr("id", "array(1.0, 2.0) as v")
    intercept[IllegalArgumentException] {
      Similarity.rpTopKForQueries(e.toDF(), e.toDF(), "id", "v", 2, candidateK = 3, k = 5)
    }
  }
}
