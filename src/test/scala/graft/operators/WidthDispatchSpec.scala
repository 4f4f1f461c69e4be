package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The width-dispatching front door (r16 verdict #4): resolution is
  * integer-exact so the saturation boundary is walked HERE, in pure
  * arithmetic, at the real 2^31-scale numbers no test corpus can reach —
  * and the dispatch itself is proven on both sides of a boundary moved
  * into test range via targetBucketSize. */
class WidthDispatchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("resolveKnnWidth walks the packed saturation boundary exactly (bands=2)") {
    // packed while rowsPerBand * bands <= 62; bands=2 saturates at
    // rpb=31, i.e. n = 16 * 2^31. One vector more needs bit 32 -> wide.
    val atCap = Similarity.resolveKnnWidth(16L << 31, bands = 2)
    assert(atCap.packed && atCap.rowsPerBand == 31 && atCap.nBits == 62,
      s"got $atCap")
    val past = Similarity.resolveKnnWidth((16L << 31) + 1, bands = 2)
    assert(!past.packed && past.rowsPerBand == 32, s"got $past")
    // consuming nBits on a wide resolution must fail loud, not alias
    val e = intercept[IllegalArgumentException](past.nBits)
    assert(e.getMessage.contains("wide"))
  }

  test("resolveKnnWidth matches the families' own auto sizing below saturation") {
    // the front door must dispatch packed at EXACTLY autoNBits' width,
    // or an index built through it would disagree with one built direct
    for {
      bands <- Seq(2, 4)
      // packed range ends at 16 * 2^(62/bands) vectors
      n <- Seq(1L, 100L, 5000L, 510000L, 16L << (62 / bands))
    } {
      val w = Similarity.resolveKnnWidth(n, bands)
      assert(w.packed, s"n=$n bands=$bands must still be packed")
      assert(w.nBits == Similarity.autoNBits(n, bands),
        s"n=$n bands=$bands: front door ${w.nBits} vs autoNBits ${Similarity.autoNBits(n, bands)}")
    }
    // and PAST saturation the two deliberately diverge: autoNBits caps
    // (the packed family's ceiling) while the front door leaves packed
    for (bands <- Seq(2, 4)) {
      val n = (16L << (62 / bands)) + 1
      assert(!Similarity.resolveKnnWidth(n, bands).packed,
        s"n=$n bands=$bands must dispatch wide")
    }
  }

  test("resolveKnnWidth keeps the wide family's occupancy pin past saturation") {
    // one more bit per corpus doubling, unbounded
    val w1 = Similarity.resolveKnnWidth(16L << 40, bands = 2)
    val w2 = Similarity.resolveKnnWidth(16L << 41, bands = 2)
    assert(!w1.packed && !w2.packed && w2.rowsPerBand == w1.rowsPerBand + 1,
      s"got $w1 then $w2")
  }

  // targetBucketSize=1 with bands=8 moves the boundary into test range:
  // n <= 128 -> rpb 7 (56 bits, packed); n > 128 -> rpb 8 (64 bits, wide)
  private def corpus(n: Int) = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .where(col("vec_id") < n)

  test("knnGraphAuto dispatches packed below the boundary, equal to the direct call") {
    val df = corpus(120)
    val w = Similarity.knnWidthFor(df, bands = 8, targetBucketSize = 1)
    assert(w.packed && w.nBits == 56, s"got $w")
    val auto = Similarity.knnGraphAuto(df, "vec_id", "embedding", k = 2,
        dim = 64, bands = 8, rerankFactor = 4, width = Some(w))
      .collect().map(_.toSeq).toSet
    val direct = Similarity.knnGraphQuantized(df, "vec_id", "embedding", k = 2,
        dim = 64, nBits = 56, bands = 8, rerankFactor = 4,
        signature = (c, n, d) => Similarity.lshSignatureMd5(c, n, d.get))
      .collect().map(_.toSeq).toSet
    assert(auto == direct, "packed dispatch must equal the direct packed call")
  }

  test("knnGraphAuto dispatches wide past the boundary, equal to the direct call") {
    val df = corpus(140)
    val w = Similarity.knnWidthFor(df, bands = 8, targetBucketSize = 1)
    assert(!w.packed && w.rowsPerBand == 8, s"got $w")
    val auto = Similarity.knnGraphAuto(df, "vec_id", "embedding", k = 2,
        dim = 64, bands = 8, rerankFactor = 4, width = Some(w))
      .collect().map(_.toSeq).toSet
    val direct = Similarity.knnGraphQuantizedWide(df, "vec_id", "embedding",
        k = 2, dim = 64, rowsPerBand = 8, bands = 8, rerankFactor = 4)
      .collect().map(_.toSeq).toSet
    assert(auto == direct, "wide dispatch must equal the direct wide call")
  }

  test("cosineNearDupAuto dispatches on both sides of the boundary") {
    val below = corpus(120)
    val wb = Similarity.knnWidthFor(below, bands = 8, targetBucketSize = 1)
    val autoB = Similarity.cosineNearDupAuto(below, "vec_id", "embedding",
        threshold = 0.0, dim = 64, bands = 8, width = Some(wb))
      .collect().map(_.toSeq).toSet
    val directB = Similarity.cosineNearDupPairs(below, "vec_id", "embedding",
        threshold = 0.0, nBits = 56, bands = 8, dim = Some(64),
        signature = (c, n, d) => Similarity.lshSignatureMd5(c, n, d.get))
      .collect().map(_.toSeq).toSet
    assert(autoB == directB && autoB.nonEmpty,
      "packed near-dup dispatch must equal the direct call and find pairs")
    val above = corpus(140)
    val wa = Similarity.knnWidthFor(above, bands = 8, targetBucketSize = 1)
    assert(!wa.packed)
    val autoA = Similarity.cosineNearDupAuto(above, "vec_id", "embedding",
        threshold = 0.0, dim = 64, bands = 8, width = Some(wa))
      .collect().map(_.toSeq).toSet
    val directA = Similarity.cosineNearDupPairsWide(above, "vec_id", "embedding",
        threshold = 0.0, dim = 64, rowsPerBand = 8, bands = 8)
      .collect().map(_.toSeq).toSet
    assert(autoA == directA && autoA.nonEmpty,
      "wide near-dup dispatch must equal the direct call and find pairs")
  }

  test("a width resolved at different bands is refused, not silently re-banded") {
    val df = corpus(50)
    val w = Similarity.knnWidthFor(df, bands = 4)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnGraphAuto(df, "vec_id", "embedding", k = 2, dim = 64,
        bands = 2, width = Some(w))
    }
    assert(e.getMessage.contains("bands"))
  }
}
