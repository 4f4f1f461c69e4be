package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Design: media travels as an opaque `binary` column plus a typed
  * metadata struct — Spark never interprets the payload, so parquet column
  * pruning keeps metadata-only queries from ever reading the bytes, and
  * the payload column stays out of every shuffle that doesn't need it.
  * Per-item decode/feature work runs inside `mapPartitions` so a real
  * decoder (JNI image lib, ffmpeg pipe, ONNX session) amortizes its
  * per-partition setup across the batch — the Scala analogue of a Pandas
  * UDF's batch shape.
  *
  * The decode kernels themselves are STUBBED with deterministic fakes
  * (this container ships no image/audio codecs): [[DecodeStub]] derives
  * pseudo pixels/samples from the bytes. The Spark-side plumbing — schema,
  * batch iteration, partitioning, output shapes — is real and tested, and
  * swapping a real codec in touches only the stub.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png, wav, mp4, ...
    StructField("width", IntegerType),       // images/video
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),    // video
    StructField("sample_rate", IntegerType)  // audio
  ))

  /** Canonical asset schema: id + opaque payload + metadata struct. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", MediaMetaType)))

  /** Deterministic fake decode kernels. A real deployment replaces these
    * bodies with codec calls; signatures and shapes are the contract. */
  object DecodeStub {
    /** "Decode" a payload to `dim` grayscale-ish floats in [0,1]: cell d
      * is the first 16 bits of md5(content ++ byte(65+d)) / 65535. Chosen
      * over a bespoke rolling hash because md5 gives the fake an exact
      * SQL twin — DuckDB:
      * `(('0x' || substr(md5(text || chr(65 + d)), 1, 4))::INT / 65535.0)::REAL`
      * — which is what lets the multimodal plumbing be oracle-checked
      * end to end. Cells cycle every 191 salts to stay in single-byte
      * ASCII (dim <= 62 keeps chr() printable for the SQL twin). */
    def decodeFeatures(content: Array[Byte], dim: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        md.reset()
        md.update(content)
        md.update((65 + d % 191).toByte)
        val dig = md.digest()
        val v = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
        out(d) = (v / 65535.0).toFloat
        d += 1
      }
      out
    }

    /** "Resize": deterministic re-sample of the fake pixel space. */
    def resize(features: Array[Float], newDim: Int): Array[Float] = {
      val out = new Array[Float](newDim)
      var i = 0
      while (i < newDim) {
        out(i) = features((i.toLong * features.length / newDim).toInt)
        i += 1
      }
      out
    }

    /** "Frame sample": pick every k-th frame index of a video payload. */
    def sampleFrames(nFrames: Int, every: Int): Array[Int] =
      (0 until nFrames by math.max(1, every)).toArray
  }

  /** Wrap a (id, payload) frame into the canonical media schema with
    * caller-supplied metadata columns. */
  def asMedia(df: DataFrame, idCol: String, contentCol: String,
      mediaType: String, format: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(contentCol).cast(BinaryType).as("content"),
      struct(
        lit(mediaType).as("media_type"), lit(format).as("format"),
        lit(null).cast(IntegerType).as("width"), lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("n_frames"), lit(null).cast(IntegerType).as("sample_rate")
      ).as("meta"))

  /** Decode + feature-extract over partitions: one decoder instantiation
    * per partition (where a real codec/session would be constructed), one
    * fixed-size float vector per asset. Output: (media_id, features). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      // real impl: construct the decoder/session HERE, once per partition
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        // null payload -> null features (the row survives; callers filter)
        if (bytes == null) Row(id, null)
        else Row(id, DecodeStub.decodeFeatures(bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Resize pass over an existing feature column (kept as a separate
    * narrow transformation: at scale you chain these without re-decoding). */
  def resizeFeatures(features: DataFrame, newDim: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = Encoders.row(outSchema)
    val idIdx = features.schema.fieldIndex("media_id")
    val fIdx = features.schema.fieldIndex("features")
    features.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(fIdx)) Row(r.getLong(idIdx), null)
        else {
          val f = r.getSeq[Float](fIdx).toArray
          val resized = if (f.isEmpty) new Array[Float](newDim) else DecodeStub.resize(f, newDim)
          Row(r.getLong(idIdx), resized.toSeq)
        }
      }
    }(enc)
  }

  /** Metadata-only video frame-sampling plan: computes the retained frame
    * indices per asset WITHOUT touching `content` (column pruning keeps
    * the payload out of the scan entirely — check ReadSchema). */
  def plannedFrameSample(media: DataFrame, every: Int): DataFrame =
    media.select(col("media_id"), col("meta.n_frames").as("n_frames"))
      .where(col("n_frames").isNotNull)
      .withColumn("kept_frames",
        // n_frames = 0 would make sequence(0, -1, +1) throw; emit empty
        when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1, lit(math.max(1, every))))
          .otherwise(typedLit(Seq.empty[Int])))
      .withColumn("n_kept", size(col("kept_frames")))
}
