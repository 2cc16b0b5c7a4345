package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Streaming multimodal ingest — the decode half of the media pipeline
  * run continuously as payload files land: stateless iterator
  * `mapPartitions` per micro-batch, one codec call per record,
  * malformed payloads dropped (P4), exactly the batch operators'
  * shape. Decode is per-row pure, so streamed == batch by
  * construction; the spec pins it against the oracle-verified
  * `multimodal_audio` stats anyway (the codec-format guard
  * `Multimodal.pcmStats` is shared, not re-implemented).
  */
object MediaStream {

  /** One streamed decoded-audio row (the [[Multimodal.AudioMeta]]
    * stats without the ordering a stream cannot provide). */
  case class AudioRow(doc_id: Long, source: String,
                      sample_rate: Long, n_samples: Long, duration_us: Long,
                      peak_abs: Long, sum_abs: Long, sum_sq: Long)

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

  /** Decode a WAV payload stream to signal stats — works identically
    * on streaming and batch frames. */
  def audioStatsStream(media: DataFrame): Dataset[AudioRow] = {
    import media.sparkSession.implicits._
    media
      .where(col("payload").isNotNull)
      .select(col("doc_id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, src, payload) =>
        Multimodal.decodeWav(payload).flatMap { case (fmt, pcm) =>
          Multimodal.pcmStats(fmt, pcm).map { case (rate, n, peak, sumAbs, sumSq) =>
            AudioRow(id, src, rate, n, n * 1000000L / rate, peak, sumAbs, sumSq)
          }
        }
      })
  }
}
