package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: media (image/audio/video) travels through
  * the pipeline as an opaque `binary` payload column with typed
  * metadata, exactly as a 100 TB training pipeline carries it in
  * parquet. The Spark-side plumbing — schema, partition-friendly batch
  * iteration, frame sampling, checksum/stats — is real and tested; the
  * actual codec call is STUBBED (no image/audio libraries in this
  * container) behind a deterministic fake, clearly marked below.
  *
  * The fixture corpus has no binary column, so `documents.text` encoded
  * as UTF-8 bytes stands in for the payload; every byte-level operation
  * (octet lengths, byte extraction, checksums) is the same code a real
  * media payload would take.
  */
object Multimodal {

  case class Media(doc_id: Long, source: String, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, source: String, n_bytes: Int,
                         width: Int, height: Int, channels: Int, checksum: Long)

  /** `documents` with the text re-encoded as an opaque binary payload —
    * the canonical multimodal row shape (id, provenance, payload). */
  def withPayload(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))

  /** =========================== STUB ===============================
    * Deterministic fake "decode": derives image-like dimensions from the
    * byte length instead of parsing a codec header. A real deployment
    * replaces ONLY the body of this function with the codec call
    * (e.g. javax.imageio / ffmpeg bindings) — signature, batching shape,
    * and everything downstream stay as-is.
    * ================================================================ */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (1 + n % 64, 1 + (n / 7) % 64, 3)
  }

  /** Batch decode over partitions: iterator-in/iterator-out, one stub
    * codec call per record, no per-partition materialization — the shape
    * that keeps executor memory flat no matter the partition size. */
  def decodeAll(media: Dataset[Media]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, c) = decodeStub(m.payload)
        // FNV-1a over the payload: cheap streaming checksum, no allocation.
        var hash = 0xcbf29ce484222325L
        var i = 0
        while (i < m.payload.length) {
          hash = (hash ^ (m.payload(i) & 0xffL)) * 0x100000001b3L
          i += 1
        }
        DecodedMeta(m.doc_id, m.source, m.payload.length, w, h, c, hash)
      }
    }
  }

  /** =========================== STUB ===============================
    * Resize: recompute target dimensions preserving aspect ratio
    * (exact integer arithmetic); a real deployment replaces the body
    * with the codec's rescale call. The metadata plumbing — new dims
    * propagated alongside the payload — is the real part.
    * ================================================================ */
  def resizeStub(meta: DecodedMeta, maxSide: Int): DecodedMeta = {
    val side = math.max(meta.width, meta.height)
    if (side <= maxSide) meta
    else DecodedMeta(meta.doc_id, meta.source, meta.n_bytes,
      math.max(1, meta.width * maxSide / side),
      math.max(1, meta.height * maxSide / side),
      meta.channels, meta.checksum)
  }

  /** Batch resize over partitions — same iterator shape as decodeAll. */
  def resizeAll(decoded: Dataset[DecodedMeta], maxSide: Int): Dataset[DecodedMeta] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions(_.map(resizeStub(_, maxSide)))
  }

  /** Frame sampling: pick `frames` evenly spaced byte offsets from each
    * payload and emit (doc_id, frame_no, offset, byte) — the plumbing a
    * video pipeline uses to fan one blob out to per-frame rows, done
    * with posexplode so it stays inside Catalyst. */
  def frameSample(payloads: DataFrame, frames: Int = 4): DataFrame = {
    val n = length(col("payload"))
    val step = greatest(lit(1), (n / frames).cast("int"))
    // empty payloads: sequence(0, -1, 1) is an illegal-bounds runtime
    // error in Spark, so they contribute zero frame rows instead; a
    // payload shorter than `frames` bytes yields one row per byte
    // (fewer than `frames`) — offsets never exceed the payload.
    val offsets = when(n === 0, array().cast("array<int>"))
      .otherwise(slice(sequence(lit(0), n - 1, step), 1, frames))
    payloads
      .select(col("doc_id"), col("payload"), posexplode(offsets).as(Seq("frame_no", "offset")))
      .select(col("doc_id"), col("frame_no"), col("offset"),
        conv(hex(substring(col("payload"), col("offset") + 1, lit(1))), 16, 10)
          .cast("int").as("byte_value"))
  }

  /** [[frameSample]] over the fixture payloads as an oracle query —
    * every sampled (frame offset, byte) must match DuckDB extracting
    * the same UTF-8 octets (the twin hexes the whole payload once and
    * slices two hex chars per frame; same bytes, same arithmetic). */
  def multimodalFrames(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(withPayload(spark, sfDir))
      .orderBy(col("doc_id").asc, col("frame_no").asc)

  val multimodalFramesSql: String =
    """WITH p AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      |           FROM documents),
      |f AS (SELECT p.doc_id, CAST(k.range AS INT) AS frame_no,
      |             CAST(k.range * greatest(1, n // 4) AS INT) AS "offset", p.hx
      |      FROM p, range(4) k
      |      WHERE p.n > 0 AND k.range * greatest(1, n // 4) <= p.n - 1)
      |SELECT doc_id, frame_no, "offset",
      |       CAST(concat('0x', substr(hx, "offset" * 2 + 1, 2)) AS INT) AS byte_value
      |FROM f
      |ORDER BY doc_id ASC, frame_no ASC""".stripMargin

  /** Oracle-backed stats over the multimodal rows: byte totals and the
    * stub-decoded dimension sums per source — pure integer arithmetic,
    * identical in DuckDB. */
  def multimodalStats(spark: SparkSession, sfDir: String): DataFrame = {
    val nBytes = length(col("text").cast("binary")).cast("long")
    val width = lit(1L) + nBytes % 64
    val height = lit(1L) + floor(nBytes / 7) % 64
    Tables.documents(spark, sfDir)
      .select(col("source"), nBytes.as("n_bytes"), width.as("w"), height.as("h"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        sum(col("w") * col("h") * 3).as("total_pixels"))
      .orderBy(col("source").asc)
  }

  val multimodalStatsSql: String =
    """SELECT source,
      |       COUNT(*) AS n_docs,
      |       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
      |       CAST(SUM((1 + n_bytes % 64) * (1 + (n_bytes // 7) % 64) * 3) AS BIGINT) AS total_pixels
      |FROM (SELECT source, octet_length(encode(text)) AS n_bytes FROM documents)
      |GROUP BY source
      |ORDER BY source ASC""".stripMargin
}
