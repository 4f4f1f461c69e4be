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
  * Decode kernels come in two flavors:
  *   - [[ImageCodec]] is a REAL image codec — JDK `javax.imageio`
  *     (PNG/JPEG/BMP/GIF readers ship with every JDK; public API, no
  *     native deps). [[decodeImageMeta]] runs it inside the
  *     mapPartitions seam to recover true width/height/channels and a
  *     pixel checksum from the payload bytes.
  *   - [[DecodeStub]] remains for the FEATURE path (a learned
  *     image-embedding model has no in-container analogue): it derives
  *     deterministic pseudo-features from the bytes, chosen so the whole
  *     binary -> mapPartitions -> array<float> pipeline keeps an exact
  *     SQL twin. Swapping a real encoder in touches only the stub.
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

  /** Real image encode/decode through JDK `javax.imageio` — no stub.
    * Works headless (BufferedImage never touches a display). */
  object ImageCodec {
    /** Decode any ImageIO-supported payload (PNG/JPEG/BMP/GIF); None for
      * null, truncated, or non-image bytes — a 100 TB crawl corpus always
      * contains undecodable payloads, and they must degrade to null rows,
      * not task failures. */
    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null) None
      else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }

    /** Encode a width x height 8-bit grayscale PNG whose pixel (x, y) is
      * `pixel(x, y) & 0xff`. Gray PNG is lossless, so a decode reads back
      * the exact samples — the property the oracle-checked round trip
      * relies on. */
    def encodePngGray(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** Deterministic real-PNG corpus from an id column: each id becomes an
    * actual PNG payload (dims and pixels are closed-form functions of the
    * id, so an oracle can recompute what a correct decode must find).
    * This is the fixture generator for the oracle-checked decode round
    * trip — and a real encode kernel in its own right. */
  def syntheticPngMedia(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.row(MediaSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = (1 + id % 16).toInt
        val h = (1 + id % 9).toInt
        val bytes = ImageCodec.encodePngGray(w, h,
          (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
        Row(id, bytes, Row("image", "png", w, h, null, null))
      }
    }(enc)
  }

  /** Decode payloads with the REAL codec: one ImageIO pass per asset,
    * emitting true width/height/channel-count plus a band-0 sample sum
    * (the deterministic pixel checksum the oracle recomputes).
    * Undecodable/null payloads survive as null-metric rows. */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_channels", IntegerType),
      StructField("pixel_sum", LongType)))
    val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        ImageCodec.decode(r.getAs[Array[Byte]](contentIdx)) match {
          case None => Row(id, null, null, null, null)
          case Some(img) =>
            val raster = img.getRaster
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            Row(id, img.getWidth, img.getHeight, raster.getNumBands, sum)
        }
      }
    }(enc)
  }

  /** Real audio encode/decode through JDK `javax.sound.sampled` — the
    * audio twin of [[ImageCodec]]. WAV/PCM is a JDK-native format: no
    * external codecs, and 16-bit PCM round-trips samples exactly. */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Encode mono 16-bit little-endian PCM samples as a WAV payload. */
    def encodeWavPcm16Mono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val stream = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode a WAV payload: (sampleRate, channels, bitDepth, frames,
      * signed sum of channel-0 16-bit samples). None for null/garbage
      * bytes — same degrade-to-null contract as [[ImageCodec.decode]]. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Long, Long)] =
      if (bytes == null) None
      else try {
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val data = in.readAllBytes()
          var sum = 0L
          if (fmt.getSampleSizeInBits == 16) {
            val frameSize = fmt.getFrameSize
            var off = 0
            while (off + 1 < data.length) {
              val lo = data(off) & 0xff
              val hi = data(off + 1).toInt
              sum += (hi << 8) | lo // channel 0, little-endian signed
              off += frameSize
            }
          }
          Some((fmt.getSampleRate.toInt, fmt.getChannels,
            fmt.getSampleSizeInBits, frames, sum))
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }

  /** Deterministic real-WAV corpus from an id column — the audio twin of
    * [[syntheticPngMedia]]: frame count and samples are closed-form
    * functions of the id, so an oracle can recompute what a correct
    * decode must find. */
  def syntheticWavMedia(df: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.row(MediaSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val n = (64 + id % 128).toInt
        val samples = Array.tabulate(n)(i => (((id * 31 + i * 7) % 2048) - 1024).toShort)
        val bytes = AudioCodec.encodeWavPcm16Mono(8000, samples)
        Row(id, bytes, Row("audio", "wav", null, null, null, 8000))
      }
    }(enc)
  }

  /** Decode audio payloads with the REAL codec: true sample rate /
    * channels / bit depth / frame count plus the signed channel-0 sample
    * sum (the checksum the oracle recomputes). Undecodable payloads
    * survive as null-metric rows. */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_channels", IntegerType),
      StructField("bit_depth", IntegerType),
      StructField("n_frames", LongType),
      StructField("sample_sum", LongType)))
    val enc = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        AudioCodec.decode(r.getAs[Array[Byte]](contentIdx)) match {
          case None => Row(id, null, null, null, null, null)
          case Some((rate, ch, bits, frames, sum)) =>
            Row(id, rate, ch, bits, frames, sum)
        }
      }
    }(enc)
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
