package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.5): image/audio/video as opaque
  * `binary` payloads with typed metadata, plus batched feature extraction.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, typed
  * pipeline — is real and tested. The codec step is a STUB: this container
  * ships no image/audio libraries, so `decodeStub` produces a deterministic
  * fake feature vector (a normalized byte histogram) where a production
  * build would call the real decoder inside the same `mapPartitions` batch
  * loop. Swap `decodeStub` for a JNI/FFM codec call and nothing else moves.
  *
  * Scale notes: payloads stay opaque binary end-to-end (parquet binary
  * columns — no base64 inflation); feature extraction is `mapPartitions`
  * over batches so decoder init amortizes across a partition, mirroring
  * PySpark's `mapInPandas` batch contract; metadata lives in a separate
  * struct column so metadata-only queries never touch the payload bytes
  * (parquet column pruning).
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long, kind: String, dim: Int, features: Array[Float])

  /** Batch size for the decode loop — the `mapInPandas`-style unit a real
    * codec would process per call.
    */
  final val DecodeBatchSize = 64

  /** Adapt any table with an id + string column into media records (the
    * sandbox stand-in for reading real image/audio payload files).
    */
  def packAsMedia(
      df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      struct(
        lit("raw").as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        lit(0L).as("durationMs")).as("meta"))

  /** STUB decoder: deterministic 16-bin byte histogram, L1-normalized.
    * Production: replace the body with the real image/audio decode +
    * model-forward pass; signature and batching stay identical.
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val counts = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      counts(((payload(i) & 0xFF) * dim) / 256) += 1f
      i += 1
    }
    val total = math.max(payload.length, 1).toFloat
    counts.map(_ / total)
  }

  /** Batched feature extraction over the binary payload column. */
  def extractFeatures(
      spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.grouped(DecodeBatchSize).flatMap { batch =>
        // one "decoder session" per batch (amortized init in production)
        batch.map { r =>
          MediaFeatures(r.media_id, r.kind, dim, decodeStub(r.payload, dim))
        }
      }
    }
  }

  /** Resize STUB: keep every `factor`-th payload byte. Production: the
    * real scaler (image resize / audio resample) runs inside the same
    * batched loop — resize is a codec-boundary op, so it lives next to
    * decode, not in a SQL expression. Payload shrinks ~`factor`x; metadata
    * passes through unchanged (the stub's fake dims carry no geometry).
    */
  private def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Batched payload downsample over the binary payload column (same
    * `mapPartitions` batch contract as [[extractFeatures]]).
    */
  def resize(
      spark: SparkSession, media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map(r => r.copy(payload = resizeStub(r.payload, factor)))
      }
    }.toDF()
  }

  /** Frame sampling STUB: pretends every `frameBytes` slice of the payload
    * is one video frame and keeps every `stride`-th — exercising the
    * explode/one-to-many shape (media row → frame rows) a real sampler has.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        greatest((length(col("payload")) / frameBytes).cast("int"), lit(1)))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn("frame_payload",
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .select("media_id", "kind", "frame_idx", "frame_payload")

  /** Metadata projection: id/kind/format plus payload size — everything a
    * catalog query needs without decoding.
    */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      col("meta.format").as("format"),
      length(col("payload")).as("payload_bytes"))
}
