package graft.multimodal

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque `content` bytes + typed metadata — the
  * multimodal-column pattern for training-data pipelines (image/audio/video
  * as `binary`, schema'd metadata alongside).
  */
final case class MediaRecord(
    media_id: Long,
    kind: String, // image | audio | video
    mime: String,
    content: Array[Byte]
)

/** Decoded per-object features (the output schema of the decode stage). */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    feature_hash: Long
)

/** Multimodal column processing: binary content + typed metadata in, decoded
  * features out, via batched `mapPartitions` over a typed Dataset — the
  * Scala analogue of `mapInPandas` (records stream through in bounded
  * batches; a real decoder would hand each batch to native code).
  *
  * ===== STUB BOUNDARY =====
  * This container ships no image/audio/video codecs, so [[decodeOne]] is a
  * clearly-marked deterministic FAKE: features are pure functions of the
  * bytes (length, first/last byte, rolling hash). Everything around it —
  * schema, encoders, batching shape, partition parallelism, the query
  * surface — is real, and because the fake is a pure byte formula the driver
  * can still oracle-check the whole path end-to-end in SQL. Swapping in a
  * real decoder changes only the body of [[decodeOne]].
  *
  * Scale notes: decode is embarrassingly parallel and CPU-bound — at 100 TB
  * you repartition by size (`maxPartitionBytes`) not by row count, keep
  * batches small enough for decoder memory, and never collect. The binary
  * column rides parquet as-is; parquet page-level column pruning means
  * metadata-only queries never read the bytes.
  */
object MediaPipeline {

  /** Batch size for the decode stage (the `mapInPandas` arrow-batch twin):
    * bounds decoder memory per task regardless of partition size.
    */
  val DecodeBatchSize = 64

  private val Kinds = Seq("image", "audio", "video")
  private val Mimes = Map("image" -> "image/png", "audio" -> "audio/wav", "video" -> "video/mp4")

  /** Synthesize a media table from `documents` (content = UTF-8 bytes of the
    * text — the only bytes available in the harness; the pipeline treats
    * them as opaque).
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Kinds), (col("doc_id") % 3).cast("int") + 1).as("kind"),
        element_at(typedLit(Mimes), element_at(typedLit(Kinds), (col("doc_id") % 3).cast("int") + 1))
          .as("mime"),
        encode(col("text"), "UTF-8").as("content")
      )
      .as[MediaRecord]
  }

  /** ===== STUB ===== deterministic fake decode (see class doc). A real
    * implementation would parse the container format here.
    */
  private[multimodal] def decodeOne(m: MediaRecord): MediaFeatures = {
    val bytes   = m.content
    val n       = bytes.length.toLong
    val first   = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val last    = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else 0
    val width   = 64 + (first % 64)
    val height  = 64 + (last % 64)
    val frames  = if (m.kind == "video") (1 + n % 30).toInt else 1
    var h       = 0L
    var i       = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 2147483647L; i += 1 }
    MediaFeatures(m.media_id, m.kind, n, width, height, frames, h)
  }

  /** Decode stage: batched mapPartitions (each task pulls
    * [[DecodeBatchSize]] records at a time — the decoder-memory contract of
    * `mapInPandas` — and maps them through [[decodeOne]]).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch => batch.map(decodeOne) }
    }
  }

  /** Frame sampling for video content: the byte stream is cut into
    * fixed-size "frames" (STUB for container parsing, same boundary as
    * [[decodeOne]]) and every `everyN`-th frame is kept; returns
    * (media_id, frame_no, frame_bytes) with `frame_no` the original frame
    * index.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int = 10, everyN: Int = 10): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "video")
      .flatMap { m =>
        m.content.grouped(frameSize).zipWithIndex.collect {
          case (frame, idx) if idx % everyN == 0 => (m.media_id, idx, frame)
        }
      }
      .toDF("media_id", "frame_no", "frame_bytes")
  }
}
