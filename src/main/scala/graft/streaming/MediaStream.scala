package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Streaming multimodal ingest — the decode half of the media pipeline
  * run continuously as payload files land: stateless iterator
  * `mapPartitions` per micro-batch, one codec call per record,
  * malformed payloads dropped (P4), exactly the batch operators'
  * shape. The transform IS the batch one — [[Multimodal.audioStats]]
  * works on streaming and batch frames alike because decode is
  * per-row pure — so streamed == batch by construction, and the spec
  * pins it against the oracle-verified `multimodal_audio` anyway.
  */
object MediaStream {

  /** File-source stream over a payload parquet directory
    * (doc_id, source, payload). */
  def readMediaStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 1): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("source", StringType),
      StructField("payload", BinaryType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
  }

  /** Decode a WAV payload stream to signal stats — the shared batch
    * transform applied to the stream. */
  def audioStatsStream(media: DataFrame): Dataset[Multimodal.AudioMeta] = {
    import media.sparkSession.implicits._
    Multimodal.audioStats(
      media
        .where(col("payload").isNotNull)
        .select(col("doc_id"), col("source"), col("payload"))
        .as[Multimodal.Media])
  }

  /** Parse a video-container payload stream to per-frame decode rows —
    * the shared batch transform ([[Multimodal.videoFrames]]) applied to
    * the stream; a corrupt frame rejects its whole document (P4),
    * streaming or batch alike. */
  def videoFramesStream(media: DataFrame): Dataset[Multimodal.FrameMeta] = {
    import media.sparkSession.implicits._
    Multimodal.videoFrames(
      media
        .where(col("payload").isNotNull)
        .select(col("doc_id"), col("source"), col("payload"))
        .as[Multimodal.Media])
  }

  /** Streaming media QUARANTINE, audio side: the `violationsStream`
    * pattern (DocStream) for binary payloads — every payload the decode
    * path refuses (null, undecodable, unsupported format) flows to a
    * quarantine sink with its reason instead of being silently dropped.
    * NOTE: deliberately no `payload IS NOT NULL` pre-filter — null
    * payloads are the quarantine's business. Stateless, so checkpoint
    * recovery is the file-source's exactly-once replay. */
  def audioQuarantineStream(media: DataFrame): Dataset[Multimodal.MediaVerdict] = {
    import media.sparkSession.implicits._
    Multimodal.audioRejects(
      media.select(col("doc_id"), col("source"), col("payload"))
        .as[Multimodal.Media])
  }

  /** Streaming media quarantine, video-container side. */
  def videoQuarantineStream(media: DataFrame): Dataset[Multimodal.MediaVerdict] = {
    import media.sparkSession.implicits._
    Multimodal.videoRejects(
      media.select(col("doc_id"), col("source"), col("payload"))
        .as[Multimodal.Media])
  }
}
