package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def media = {
    val rows = Seq(
      Row(1L, "fake png bytes one".getBytes("UTF-8")),
      Row(2L, "fake png bytes two".getBytes("UTF-8")),
      Row(3L, "fake png bytes one".getBytes("UTF-8"))) // dup payload of 1
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType), StructField("bytes", BinaryType))))
    Multimodal.asMedia(df, "id", "bytes", "image", "png")
  }

  test("asMedia produces the canonical schema (names + types)") {
    def shape(t: StructType): Seq[(String, DataType)] = t.fields.toSeq.map {
      case StructField(n, s: StructType, _, _) => n -> StructType(shape(s).map { case (fn, ft) => StructField(fn, ft) })
      case StructField(n, d, _, _)             => n -> d
    }
    assert(shape(media.schema) == shape(Multimodal.MediaSchema))
    assert(media.count() == 3)
  }

  test("extractFeatures: fixed dim, deterministic, equal payloads -> equal features") {
    val f = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f.values.forall(_.size == 16))
    assert(f(1L) == f(3L)) // identical payloads
    assert(f(1L) != f(2L)) // different payloads
    assert(f.values.flatten.forall(v => v >= 0f && v <= 1f))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again == f)
  }

  test("resizeFeatures downsamples to requested dim") {
    val f = Multimodal.extractFeatures(media, dim = 64)
    val r = Multimodal.resizeFeatures(f, 8).collect().map(_.getSeq[Float](1))
    assert(r.forall(_.size == 8))
  }

  test("media features feed the similarity operators (pipeline integration)") {
    val feats = Multimodal.extractFeatures(media, dim = 32)
      .withColumnRenamed("media_id", "vec_id").withColumnRenamed("features", "embedding")
    val q = feats.where(org.apache.spark.sql.functions.col("vec_id") === 1)
      .head().getSeq[Float](1).map(_.toDouble)
    val top = Similarity.bruteForceTopK(feats, "vec_id", "embedding", q, 3).collect()
    // ids 1 and 3 share a payload -> cosine 1.0 for both, id asc tie-break
    assert(top.map(_.getLong(0)).take(2).toSeq == Seq(1L, 3L))
    assert(math.abs(top(1).getDouble(1) - 1.0) < 1e-9)
  }

  test("null payload survives extract/resize as null features; zero frames -> empty plan") {
    import org.apache.spark.sql.functions._
    val rows = Seq(Row(1L, "bytes".getBytes("UTF-8")), Row(2L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType), StructField("bytes", BinaryType, true))))
    val feats = Multimodal.extractFeatures(
      Multimodal.asMedia(df, "id", "bytes", "image", "png"), dim = 8)
    val collected = feats.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(collected == Map(1L -> false, 2L -> true))
    val resized = Multimodal.resizeFeatures(feats, 4).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(resized == Map(1L -> false, 2L -> true))
    // n_frames = 0 must not crash sequence()
    val zeroFrames = media.withColumn("meta",
      struct(col("meta.media_type"), col("meta.format"), col("meta.width"),
        col("meta.height"), lit(0).as("n_frames"), col("meta.sample_rate")))
    val plan = Multimodal.plannedFrameSample(zeroFrames, 2).collect()
    assert(plan.forall(_.getAs[Int]("n_kept") == 0))
  }

  test("ImageCodec decodes a real checked-in PNG fixture to its true dims and pixels") {
    // fixture: 8x5 8-bit grayscale, pixel(x,y) = (x*7 + y*13) % 256
    val in = getClass.getResourceAsStream("/graft/fixture_8x5.png")
    val bytes = in.readAllBytes(); in.close()
    val img = Multimodal.ImageCodec.decode(bytes).getOrElse(fail("fixture must decode"))
    assert(img.getWidth == 8 && img.getHeight == 5)
    val sum = (for (y <- 0 until 5; x <- 0 until 8)
      yield img.getRaster.getSample(x, y, 0)).sum
    assert(sum == 2020, "decoded samples must match the fixture's known pixel sum")
    // and through the distributed seam:
    val rows = Seq(Row(7L, bytes), Row(8L, Array[Byte](1, 2, 3)), Row(9L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType), StructField("bytes", BinaryType, true))))
    val meta = Multimodal.decodeImageMeta(
        Multimodal.asMedia(df, "id", "bytes", "image", "png"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getLong(4))))).toMap
    assert(meta(7L).contains((8, 5, 2020L)))
    assert(meta(8L).isEmpty, "garbage bytes degrade to a null row, not a task failure")
    assert(meta(9L).isEmpty, "null payload degrades to a null row")
  }

  test("WAV encode -> decode round-trips rate, frames, and the exact sample sum") {
    val id = 42L
    val n = (64 + id % 128).toInt
    val samples = Array.tabulate(n)(i => (((id * 31 + i * 7) % 2048) - 1024).toShort)
    val bytes = Multimodal.AudioCodec.encodeWavPcm16Mono(8000, samples)
    val (rate, ch, bits, frames, sum) = Multimodal.AudioCodec.decode(bytes).get
    assert(rate == 8000 && ch == 1 && bits == 16 && frames == n)
    assert(sum == samples.map(_.toLong).sum, "decoded PCM must be sample-exact")
    // garbage and null degrade to null rows through the seam
    val rows = Seq(Row(1L, bytes), Row(2L, Array[Byte](9, 9, 9)), Row(3L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType), StructField("bytes", BinaryType, true))))
    val meta = Multimodal.decodeAudioMeta(
        Multimodal.asMedia(df, "id", "bytes", "audio", "wav"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(meta == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("PNG encode -> decode round-trips dims and every sample exactly") {
    val id = 42L
    val w = (1 + id % 16).toInt; val h = (1 + id % 9).toInt
    val bytes = Multimodal.ImageCodec.encodePngGray(w, h,
      (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
    val img = Multimodal.ImageCodec.decode(bytes).get
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == ((id * 31 + x * 7 + y * 13) % 256).toInt)
  }

  test("plannedFrameSample never reads the payload column") {
    import org.apache.spark.sql.functions._
    val withFrames = media.withColumn("meta",
      struct(col("meta.media_type"), col("meta.format"), col("meta.width"),
        col("meta.height"), lit(10).as("n_frames"), col("meta.sample_rate")))
    val plan = Multimodal.plannedFrameSample(withFrames, every = 3)
    val kept = plan.collect().map(r => r.getSeq[Int](r.fieldIndex("kept_frames")).toSeq).head
    assert(kept == Seq(0, 3, 6, 9))
    assert(Multimodal.DecodeStub.sampleFrames(10, 3).toSeq == kept)
    // column pruning: the optimized plan must not reference `content`
    val optimized = plan.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("content"), s"payload not pruned:\n$optimized")
  }
}
