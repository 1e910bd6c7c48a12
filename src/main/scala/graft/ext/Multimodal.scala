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

  /** A real media decoder would go here; stubbed — container has no codecs.
    * Wire format / plumbing identical to [[ByteHistogramExtractor]]. */
  class MediaDecodeExtractor extends FeatureExtractor {
    val dims = 16
    def extract(payload: Array[Byte]): Array[Float] =
      throw new UnsupportedOperationException(
        "media codecs unavailable in this environment; use ByteHistogramExtractor")
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
}
