package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PhashSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val mediaSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType)))

  private def mediaDf(rows: Seq[(Long, Array[Byte])]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      mediaSchema)

  private def pngRgbGray(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width) {
      val v = pixel(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def phashes(df: DataFrame): Map[Long, Option[Long]] =
    Multimodal.perceptualHash(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("same pixels hash equal across different byte encodings (gray vs RGB PNG)") {
    val pix = (x: Int, y: Int) => (x * 37 + y * 11) % 256
    val gray = Multimodal.ImageCodec.encodePngGray(12, 9, pix)
    val rgb = pngRgbGray(12, 9, pix)
    assert(!gray.sameElements(rgb), "encodings should differ at byte level")
    val h = phashes(mediaDf(Seq(1L -> gray, 2L -> rgb)))
    assert(h(1L).isDefined && h(1L) == h(2L))
  }

  test("a small pixel perturbation flips few bits; banded pairing finds the near-dup") {
    val pix = (x: Int, y: Int) => (x * 37 + y * 11) % 256
    val perturbed = (x: Int, y: Int) =>
      if (x == 5 && y == 4) 255 else pix(x, y)
    val other = (x: Int, y: Int) => (255 - x * 53 - y * 29) % 256 & 0xff
    val df = mediaDf(Seq(
      1L -> Multimodal.ImageCodec.encodePngGray(12, 9, pix),
      2L -> Multimodal.ImageCodec.encodePngGray(12, 9, perturbed),
      3L -> Multimodal.ImageCodec.encodePngGray(12, 9, other)))
    val h = phashes(df)
    val near = java.lang.Long.bitCount(h(1L).get ^ h(2L).get)
    val far = java.lang.Long.bitCount(h(1L).get ^ h(3L).get)
    assert(near <= 4, s"one-pixel edit flipped $near bits")
    assert(far > near, s"unrelated image at hamming $far should exceed $near")
    val pairs = Dedup.hammingPairs(
        Multimodal.perceptualHash(df), "media_id", "phash", 60, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) || far <= 4)
  }

  test("hammingPairs banding == brute force on random 60-bit hashes") {
    val rnd = new scala.util.Random(5)
    val base = (0 until 30).map(_ => rnd.nextLong() & ((1L << 60) - 1))
    // plant near-neighbors at controlled distances
    val hs = base.zipWithIndex.flatMap { case (v, i) =>
      val flips = (0 until (i % 5)).map(k => 1L << ((k * 13 + i) % 60)).fold(0L)(_ | _)
      Seq((2L * i).toLong -> v, (2L * i + 1).toLong -> (v ^ flips))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(hs.map(r => Row(r._1, r._2)), 5),
      StructType(Seq(StructField("id", LongType), StructField("h", LongType))))
    for (maxH <- Seq(1, 2, 3, 4)) {
      val banded = Dedup.hammingPairs(df, "id", "h", 60, maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = hs.combinations(2).collect {
        case Seq((ia, ha), (ib, hb))
            if java.lang.Long.bitCount(ha ^ hb) <= maxH =>
          (math.min(ia, ib), math.max(ia, ib),
            java.lang.Long.bitCount(ha ^ hb).toLong)
      }.toSet
      assert(banded == brute, s"maxHamming=$maxH")
    }
  }

  test("audio phash: identical envelopes hash equal, a local loudness edit stays near, pairing composes") {
    def wav(perturb: Boolean): Array[Byte] = {
      val samples = (0 until 2000).map { i =>
        val base = (math.sin(i / 40.0) * 8000).toShort
        if (perturb && i >= 900 && i < 940) (base / 8).toShort else base
      }.toArray
      Multimodal.AudioCodec.encodeWavPcm16Mono(8000, samples)
    }
    val noise = (0 until 2000).map(i =>
      (((i * 2654435761L) % 16384) - 8192).toShort).toArray
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, wav(perturb = false)), Row(2L, wav(perturb = false)),
        Row(3L, wav(perturb = true)),
        Row(4L, Multimodal.AudioCodec.encodeWavPcm16Mono(8000, noise))), 2),
      mediaSchema)
    val h = Multimodal.audioPerceptualHash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L), "identical audio must hash equal")
    val near = java.lang.Long.bitCount(h(1L) ^ h(3L))
    val far = java.lang.Long.bitCount(h(1L) ^ h(4L))
    assert(near < far, s"local edit ($near flipped) should stay nearer than noise ($far)")
    val pairs = Dedup.hammingPairs(
        Multimodal.audioPerceptualHash(df), "media_id", "phash", 60, maxHamming = near)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
  }

  test("undecodable payloads degrade to null hashes and drop out of pairing") {
    val good = Multimodal.ImageCodec.encodePngGray(4, 4, (x, y) => x + y)
    val df = mediaDf(Seq(1L -> good, 2L -> Array[Byte](1, 2, 3), 3L -> good))
    val h = phashes(df)
    assert(h(2L).isEmpty && h(1L).isDefined)
    val pairs = Dedup.hammingPairs(
        Multimodal.perceptualHash(df), "media_id", "phash", 60, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)))
  }
}
