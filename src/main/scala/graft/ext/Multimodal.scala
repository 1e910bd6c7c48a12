package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The actual media decoding is STUBBED (this container has no image/audio
  * libraries) behind [[FeatureExtractor]] — the Spark-side contract that IS
  * real and tested: schema (binary + metadata struct), batch shape
  * (mapPartitions, one extractor instance per partition, rows streamed), and
  * partitioning (narrow map, no shuffle; payload bytes never hit the
  * driver).
  */
object Multimodal {

  val payloadSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false))), nullable = false)))

  /** Attach a synthetic binary payload + metadata to the documents table —
    * stands in for real media ingest; payload = UTF-8 bytes of the text. */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height")).as("meta"))

  /** Per-partition batch feature extractor. Implementations must be
    * Serializable (shipped to executors). */
  trait FeatureExtractor extends Serializable {
    /** Decode one payload into a fixed-width feature vector. */
    def extract(payload: Array[Byte]): Array[Float]
    val dims: Int
  }

  /** Deterministic stand-in for a real decoder (e.g. JPEG → CNN features):
    * a 16-bin byte histogram, L1-normalized. Replace `extract` with a real
    * decode when media libraries are available. */
  class ByteHistogramExtractor extends FeatureExtractor {
    val dims = 16
    def extract(payload: Array[Byte]): Array[Float] = {
      val h = new Array[Float](dims)
      if (payload == null) return h
      var i = 0
      while (i < payload.length) { h((payload(i) & 0xff) >> 4) += 1f; i += 1 }
      val total = payload.length.max(1).toFloat
      var j = 0
      while (j < dims) { h(j) /= total; j += 1 }
      h
    }
  }

  /** REAL image feature extraction (round 8 — images are no longer
    * stubbed): decode the payload with `javax.imageio` ([[ImageCodec]],
    * JDK-built-in PNG/JPEG support) and emit a 16-bin LUMINANCE histogram
    * over actual pixels, L1-normalized — the pixel-space analog of
    * [[ByteHistogramExtractor]]'s byte histogram. Same wire format /
    * per-partition batch shape. */
  class ImageDecodeExtractor extends FeatureExtractor {
    val dims = 16
    def extract(payload: Array[Byte]): Array[Float] = {
      val h = new Array[Float](dims)
      if (payload == null) return h
      val (_, _, pix) = ImageCodec.decodeGray(payload)
      var i = 0
      while (i < pix.length) { h(pix(i) >> 4) += 1f; i += 1 }
      val total = pix.length.max(1).toFloat
      var j = 0
      while (j < dims) { h(j) /= total; j += 1 }
      h
    }
  }

  /** REAL video feature extraction (round 10 — AVI containers are no longer
    * stubbed): demux the payload with [[VideoCodec]] (RIFF/AVI, `MPNG`
    * PNG-in-AVI or `MJPG` motion-JPEG streams), decode every frame through
    * `javax.imageio` ([[ImageCodec]]), and emit a 16-bin luminance
    * histogram over ALL decoded frames' pixels, L1-normalized — the video
    * analog of [[ImageDecodeExtractor]]. Same wire format / per-partition
    * batch shape. INTER-frame-compressed codecs (H.264 etc.) genuinely
    * need external decoder libraries this environment lacks and fail fast
    * with a named message — that is now the only remaining media
    * boundary. */
  class MediaDecodeExtractor extends FeatureExtractor {
    val dims = 16
    def extract(payload: Array[Byte]): Array[Float] = {
      val h = new Array[Float](dims)
      if (payload == null) return h
      val (_, _, _, frames) = VideoCodec.decodeAvi(payload)
      var total = 0L
      frames.foreach { f =>
        val (_, _, pix) = ImageCodec.decodeGray(f)
        var i = 0
        while (i < pix.length) { h(pix(i) >> 4) += 1f; i += 1 }
        total += pix.length
      }
      val t = math.max(total, 1L).toFloat
      var j = 0
      while (j < dims) { h(j) /= t; j += 1 }
      h
    }
  }

  /** Batch feature extraction over (media_id, payload): one extractor per
    * partition (amortizes model/codec init — the `mapInPandas` batch shape),
    * rows streamed through an iterator, output is (media_id,
    * features array<float>). Narrow map: no shuffle, nothing on the
    * driver. */
  def extractFeatures(media: DataFrame, extractor: FeatureExtractor): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), extractor.extract(r.getAs[Array[Byte]](1)).toSeq)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic PNG fixture images keyed to the documents table: doc i
    * becomes a ((i%13)+8) × ((i%11)+8) grayscale gradient with
    * pixel(x, y) = (x + y + i) mod 256, ENCODED AS REAL PNG BYTES on the
    * executors ([[ImageCodec.encodeGrayPng]]). Because the pixel formula is
    * pure integer arithmetic and PNG is lossless, a SQL oracle can predict
    * every statistic a real decode of these payloads produces — which is
    * what lets q_media_image_decode hash-check the javax.imageio path
    * end-to-end. Narrow map (mapPartitions); payloads never hit the
    * driver. */
  def imagePayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false))), nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (id % 13).toInt + 8
        val h = (id % 11).toInt + 8
        val pix = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { pix(y * w + x) = ((x + y + id) % 256).toInt; x += 1 }
          y += 1
        }
        Row(id, ImageCodec.encodeGrayPng(w, h, pix), Row("image/png", w, h))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image decode per media row: `javax.imageio` decodes the payload
    * and emits the decoded dimensions, the exact integer luminance sum, and
    * the aHash bit string computed FROM DECODED PIXELS (not from raw
    * bytes). Narrow map, one decoder init per partition, nothing on the
    * driver. */
  def decodeImageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("sum_lum", LongType, nullable = false),
      StructField("phash_bits", StringType, nullable = false)))
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, pix) = ImageCodec.decodeGray(r.getAs[Array[Byte]](1))
          var sum = 0L; var i = 0
          while (i < pix.length) { sum += pix(i); i += 1 }
          Row(r.getLong(0), w, h, pix.length.toLong, sum,
            ImageCodec.aHashBits(w, h, pix))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image resize: decode ([[ImageCodec.decodeGray]]) → integer
    * box-average downsample to exactly (tw, th) → re-encode as PNG, with
    * metadata recomputed in the same row. Deterministic across JVMs (our
    * own integer resampler, not Graphics2D interpolation), so the output of
    * a second decode is SQL-predictable — pinned by q_media_image_decode's
    * r_sum_lum column. Narrow map. */
  def resizeImage(media: DataFrame, tw: Int, th: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, pix) = ImageCodec.decodeGray(r.getAs[Array[Byte]](1))
          val out = ImageCodec.areaResample(w, h, pix, tw, th)
          Row(r.getLong(0), ImageCodec.encodeGrayPng(tw, th, out),
            Row("image/png", tw, th))
        }
      }
    spark.createDataFrame(rdd, payloadSchema)
  }

  /** Image resize plumbing: payload → payload' with updated metadata. The
    * pixel resample itself is STUBBED (no codecs in this container) as a
    * deterministic byte downsample — the Spark contract (binary in/out,
    * metadata recomputed in the same row, narrow map) is the real part. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val resizeUdf = udf { (payload: Array[Byte], w: Int, h: Int) =>
      if (payload == null) null
      else {
        // REAL IMPL: decode → resample to fit (maxW, maxH) → re-encode.
        // Stub keeps every (targetPixels/srcPixels) fraction of bytes.
        val scale = math.min(1.0,
          (maxW.toLong * maxH).toDouble / (w.toLong * h).toDouble)
        val n = math.max(1, (payload.length * scale).toInt)
        java.util.Arrays.copyOf(payload, n)
      }
    }
    val newW = least(col("meta.width"), lit(maxW))
    val newH = least(col("meta.height"), lit(maxH))
    media.select(col("media_id"),
      resizeUdf(col("payload"), col("meta.width"), col("meta.height")).as("payload"),
      struct(col("meta.mime").as("mime"),
        newW.cast("int").as("width"), newH.cast("int").as("height")).as("meta"))
  }

  /** Perceptual fingerprint per media row: aHash (average-pool to 64 cells,
    * mean-threshold — the public aHash construction) over the payload via
    * the native codegen'd [[graft.functions.MediaHash64]] expression. Narrow
    * map; the 8-byte hash, not the payload, flows into any downstream
    * comparison. */
  def perceptualHash(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.HashFunctions.mediaHash(col("payload")).as("phash"))

  /** Near-duplicate media pairs by perceptual hash: 4×16-bit banding (any
    * pair within Hamming distance 3 shares ≥1 band — pigeonhole), verified
    * with an exact popcount ≤ maxHamming. Identical shape to text
    * SimHash dedup: bucketed candidates, never an all-pairs join, payloads
    * never leave the scan. */
  def phashNearDups(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4x16 banding guarantees candidate recall only for Hamming <= 3")
    val sigs = perceptualHash(media)
    val banded = sigs.select(col("media_id"), col("phash"), posexplode(expr(
      "transform(sequence(0, 3), j -> (phash >> (j * 16)) & 65535)"))
      .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"),
      col("media_id").as("id_a"), col("phash").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("media_id").as("id_b"), col("phash").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.HashFunctions.hamming64(col("sig_a"), col("sig_b"))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic WAV fixture clips keyed to the documents table: doc i
    * becomes ((i%7)+2) 160-sample frames of mono 8 kHz PCM16 with
    * sample(t) = ((t·step + i) mod 4097) / dv − 2048 / dv, where
    * step = (i%11)+3 and dv = 64 for every 5th doc (a near-silent clip,
    * |v| ≤ 32) else 1 (full-scale, |v| ≤ 2048) — ENCODED AS REAL WAV BYTES
    * on the executors ([[AudioCodec.encodePcm16Wav]]). All operands are
    * non-negative before the one subtraction, so `/` truncation equals
    * floor in both Scala and SQL, and since WAV/PCM is lossless a SQL
    * oracle predicts every statistic a real decode produces
    * (q_media_audio_decode — the audio analog of [[imagePayload]]). */
  def audioPayload(docs: DataFrame, samplesPerFrame: Int = 160): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType, nullable = false),
        StructField("sample_rate", IntegerType, nullable = false),
        StructField("channels", IntegerType, nullable = false))),
        nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = ((id % 7).toInt + 2) * samplesPerFrame
        val step = (id % 11) + 3
        val dv = if (id % 5 == 0) 64 else 1
        val samples = Array.tabulate(n) { t =>
          (((t * step + id) % 4097) / dv - 2048 / dv).toInt
        }
        Row(id, AudioCodec.encodePcm16Wav(8000, samples),
          Row("audio/wav", 8000, 1))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STEREO sibling of [[audioPayload]] (round 12): two deterministic
    * channels interleaved into one real PCM16 WAV per doc — the left
    * channel is [[audioPayload]]'s formula, the right channel runs a
    * distinct stride (step₂ = (i%13)+5, offset 2i) under the same
    * near-silence divisor, so the two channels' statistics genuinely
    * differ and a channel-mixing bug cannot cancel out. Every operand
    * stays non-negative before the one subtraction, so the SQL oracle
    * reproduces both channels exactly (q_media_audio_stereo). */
  def audioPayloadStereo(docs: DataFrame,
      samplesPerFrame: Int = 160): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType, nullable = false),
        StructField("sample_rate", IntegerType, nullable = false),
        StructField("channels", IntegerType, nullable = false))),
        nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = ((id % 7).toInt + 2) * samplesPerFrame
        val step = (id % 11) + 3
        val step2 = (id % 13) + 5
        val dv = if (id % 5 == 0) 64 else 1
        val interleaved = Array.tabulate(2 * n) { j =>
          val t = j / 2
          if (j % 2 == 0)
            (((t * step + id) % 4097) / dv - 2048 / dv).toInt
          else
            (((t * step2 + 2 * id) % 4097) / dv - 2048 / dv).toInt
        }
        Row(id, AudioCodec.encodePcm16Wav(8000, interleaved, channels = 2),
          Row("audio/wav", 8000, 2))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL audio decode per media row: `javax.sound.sampled` decodes the WAV
    * container and emits PER-CHANNEL integer statistics over DECODED
    * samples — one output row per (media, channel), the image path's
    * per-band precedent (round 12 widened from the mono-only fail-fast:
    * real corpora are stereo). The decoder de-interleaves the WAV frame
    * layout (sample t of channel c sits at t·ch + c), so each channel's
    * frame count, exact power sum, global peak, and silent-frame count
    * (per-frame peak ≤ `silencePeak`, an integer compare — no floating
    * point anywhere) stay oracle hash-exact. Mono payloads emit exactly
    * the single row they always did (channel 0). Narrow map, nothing on
    * the driver. */
  def decodeAudioStats(media: DataFrame, samplesPerFrame: Int = 160,
      silencePeak: Int = 64): DataFrame = {
    require(samplesPerFrame > 0)
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("channel", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_channels", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("peak", LongType, nullable = false),
      StructField("n_silent", LongType, nullable = false)))
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val (sr, ch, samples) = AudioCodec.decodePcm16(r.getAs[Array[Byte]](1))
          require(samples.length % ch == 0,
            s"media $id: ${samples.length} samples not divisible by $ch channels")
          val nPerCh = samples.length / ch
          val nFrames = (nPerCh + samplesPerFrame - 1) / samplesPerFrame
          (0 until ch).iterator.map { c =>
            var sumSq = 0L; var peak = 0L; var nSilent = 0L
            var f = 0
            while (f < nFrames) {
              var t = f * samplesPerFrame
              val end = math.min(nPerCh, t + samplesPerFrame)
              var fPeak = 0L
              while (t < end) {
                val v = samples(t * ch + c).toLong
                sumSq += v * v
                val a = math.abs(v)
                if (a > fPeak) fPeak = a
                t += 1
              }
              if (fPeak > peak) peak = fPeak
              if (fPeak <= silencePeak) nSilent += 1
              f += 1
            }
            Row(id, c, sr, ch, nPerCh.toLong, nFrames.toLong,
              sumSq, peak, nSilent)
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Audio frame energy over raw PCM16LE payloads: one row per
    * `samplesPerFrame`-sample frame with RMS amplitude and peak. This is
    * REAL signal processing, not a stub — interpreting a binary column as
    * little-endian 16-bit PCM needs no codec; a compressed container would
    * swap a decoder in front of the same frame loop. Narrow map
    * (mapPartitions), integer power sums per frame, nothing on the
    * driver. */
  def audioFrameEnergy(media: DataFrame, samplesPerFrame: Int): DataFrame = {
    require(samplesPerFrame > 0)
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("peak", LongType, nullable = false)))
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null || payload.length < 2) Iterator.empty
          else {
            val nSamples = payload.length / 2
            val nFrames = (nSamples + samplesPerFrame - 1) / samplesPerFrame
            (0 until nFrames).iterator.map { f =>
              var s = f * samplesPerFrame
              val end = math.min(nSamples, s + samplesPerFrame)
              val n = end - s
              var sum2 = 0L
              var peak = 0L
              while (s < end) {
                // little-endian int16: sign-extended high byte | low byte
                val v = (payload(2 * s + 1).toInt << 8) | (payload(2 * s) & 0xff)
                sum2 += v.toLong * v
                val a = math.abs(v.toLong)
                if (a > peak) peak = a
                s += 1
              }
              Row(r.getLong(0), f.toLong, n.toLong,
                math.sqrt(sum2.toDouble / n), peak)
            }
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic AVI fixture videos keyed to the documents table: doc i
    * becomes ((i%5)+4) frames of ((i%9)+8) × ((i%6)+8) grayscale at 10 fps,
    * PNG-compressed and muxed into a real RIFF/AVI container on the
    * executors ([[VideoCodec.encodeAviMpng]]). Frame f pixel (x, y):
    *   v = (x + 2y + 3f + i) mod 256          for f < nFrames/2
    *   v = 255 − ((x + 2y + 3f + i) mod 256)  for f ≥ nFrames/2
    * — the second half INVERTS the gradient, planting exactly one hard
    * scene cut per video at the midpoint. Pure integer arithmetic + a
    * lossless frame codec + a fully-specified container ⇒ a SQL oracle
    * predicts every statistic a real demux+decode produces
    * (q_media_video_decode — the video analog of [[imagePayload]]). */
  def videoPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false))), nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (id % 9).toInt + 8
        val h = (id % 6).toInt + 8
        val nFrames = (id % 5).toInt + 4
        val cutAt = nFrames / 2
        val frames = (0 until nFrames).map { f =>
          val pix = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = ((x + 2L * y + 3L * f + id) % 256).toInt
              pix(y * w + x) = if (f < cutAt) g else 255 - g
              x += 1
            }
            y += 1
          }
          ImageCodec.encodeGrayPng(w, h, pix)
        }
        Row(id, VideoCodec.encodeAviMpng(w, h, 10, frames),
          Row("video/x-msvideo", w, h))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL video decode to frame granularity: demux the AVI payload
    * ([[VideoCodec.decodeAvi]]), decode every PNG frame to pixels
    * ([[ImageCodec.decodeGray]]), and emit one row per frame — decoded
    * dimensions, the exact integer luminance sum, and the RAW GRAY PIXEL
    * BYTES as the `frame` binary, so downstream operators ([[sceneCuts]])
    * run their perceptual hashing over genuinely decoded pixels, not over
    * compressed container bytes. Narrow map (one demux per row, frames
    * streamed); payloads never hit the driver. */
  def decodeVideoFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("sum_lum", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val (_, _, _, frames) = VideoCodec.decodeAvi(r.getAs[Array[Byte]](1))
          frames.iterator.zipWithIndex.map { case (png, f) =>
            val (w, h, pix) = ImageCodec.decodeGray(png)
            var sum = 0L
            val raw = new Array[Byte](pix.length)
            var i = 0
            while (i < pix.length) {
              sum += pix(i); raw(i) = pix(i).toByte; i += 1
            }
            Row(id, f.toLong, w, h, pix.length.toLong, sum, raw)
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Scene-cut detection over sampled frames: hash every frame with the
    * aHash perceptual fingerprint, then flag frames whose Hamming distance
    * to the PREVIOUS frame exceeds the threshold — the shot-boundary
    * detector a video pipeline runs before per-scene sampling. Pure
    * codegen'd column ops over the frame rows (hash + one media-partitioned
    * lag window + bit_count); the only stub is upstream frame DECODING
    * ([[sampleFrames]]), not this detector. */
  def sceneCuts(frames: DataFrame, minCutHamming: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_no"))
    frames
      .withColumn("h", graft.functions.HashFunctions.mediaHash(col("frame")))
      .withColumn("prev_h", lag(col("h"), 1).over(w))
      .withColumn("dist",
        when(col("prev_h").isNotNull,
          bit_count(col("h").bitwiseXOR(col("prev_h")))).cast("long"))
      .withColumn("is_cut", coalesce(col("dist") >= minCutHamming, lit(false)))
      .select(col("media_id"), col("frame_no"), col("dist"), col("is_cut"))
  }

  /** Video frame sampling plumbing: one payload → every nth "frame" as its
    * own row (media_id, frame_no, frame binary). The codec is STUBBED as a
    * fixed-size byte chunker; the Spark shape — explode to frame granularity
    * without materializing all frames on the driver — is real. */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null) Iterator.empty
          else {
            // REAL IMPL: demux container → decode every Nth frame.
            val nFrames = payload.length / frameBytes
            (0 until nFrames by everyNth).iterator.map { f =>
              Row(r.getLong(0), f.toLong,
                java.util.Arrays.copyOfRange(payload, f * frameBytes,
                  math.min((f + 1) * frameBytes, payload.length)))
            }
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }
}
