package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column pipeline: media (image/audio/video) travels as an
  * opaque `binary` payload column with typed metadata, exactly as a
  * 100 TB training pipeline carries it in parquet. The codec is REAL —
  * PNG encode/decode through the JDK's `javax.imageio` (no external
  * libraries), with malformed payloads rejected the same way the scan
  * layer rejects malformed rows (SURVEY §1.4 P4 semantics: drop, don't
  * poison the batch).
  *
  * The fixture corpus has no media column, so the pipeline GENERATES
  * its payloads: [[pngPayloads]] renders one deterministic PNG per
  * document, dimensions derived from the text's byte length and every
  * pixel a pure arithmetic function of (doc_id, x, y, channel). That
  * makes the whole codec chain oracle-verifiable end-to-end without the
  * oracle touching a PNG: DuckDB recomputes the expected width, height,
  * and raster checksums by plain integer arithmetic, and the Spark side
  * only matches if render → encode → decode → resize → re-encode →
  * re-decode reproduces the raster bit-exactly (PNG is lossless).
  *
  * Scale shape: every stage is iterator-in/iterator-out `mapPartitions`
  * over the payload rows — one codec call per record, no per-partition
  * materialization, no shuffle until the caller aggregates. Payload
  * bytes never become join or groupBy keys.
  */
object Multimodal {

  case class Media(doc_id: Long, source: String, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, source: String, n_bytes: Long,
                         width: Long, height: Long, channels: Long, checksum: Long)
  /** One row of [[multimodalDecode]]: original decode + resized re-decode. */
  case class DecodedRoundtrip(doc_id: Long, source: String,
                              width: Long, height: Long, channels: Long, pixel_sum: Long,
                              r_width: Long, r_height: Long, r_pixel_sum: Long)

  /** Generated-image dimensions are in [1, DimMod]. */
  val DimMod = 16
  /** [[resizeAll]]/[[multimodalDecode]] bound the longer side to this. */
  val ResizeMaxSide = 8

  // ImageIO's default read/write path spills through temp-file caches;
  // executors want pure in-memory codec calls.
  ImageIO.setUseCache(false)

  /** The deterministic pixel function both engines compute: channel `c`
    * (0=R, 1=G, 2=B) of pixel (x, y) for document `docId`. */
  def pixelValue(docId: Long, x: Int, y: Int, c: Int): Int =
    ((docId * 7 + x * 3 + y * 5 + c * 11) % 256).toInt

  /** Generator dimensions for a payload of `n` text bytes. */
  def genDims(n: Long): (Int, Int) =
    ((1 + n % DimMod).toInt, (1 + (n / 7) % DimMod).toInt)

  /** Render the deterministic raster for `docId` and encode it as a real
    * PNG via the JDK encoder. */
  def renderPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pixelValue(docId, x, y, 0) << 16) |
          (pixelValue(docId, x, y, 1) << 8) |
          pixelValue(docId, x, y, 2))
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real decode. `None` for malformed payloads — garbage, truncated
    * streams, or formats no installed reader claims (`ImageIO.read`
    * returns null for the latter and throws for the former two). */
  def decodePng(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case NonFatal(_) => None }

  /** Sum of all RGB samples of the decoded raster — the checksum the
    * oracle recomputes arithmetically from [[pixelValue]]. */
  def rgbSum(img: BufferedImage): Long = {
    var s = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    s
  }

  /** Nearest-neighbor downscale bounding the longer side to `maxSide`,
    * aspect preserved with exact integer arithmetic: resized pixel
    * (x, y) is source pixel (x*w/rw, y*h/rh). Returns the input image
    * unchanged when already within bounds. Exact integer source mapping
    * (not an averaging filter) so the oracle can mirror it. */
  def resizeRaster(img: BufferedImage, maxSide: Int): BufferedImage = {
    val w = img.getWidth
    val h = img.getHeight
    val side = math.max(w, h)
    if (side <= maxSide) img
    else {
      val rw = math.max(1, w * maxSide / side)
      val rh = math.max(1, h * maxSide / side)
      val out = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < rh) {
        var x = 0
        while (x < rw) {
          out.setRGB(x, y, img.getRGB(x * w / rw, y * h / rh))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** `documents` with the text re-encoded as an opaque binary payload —
    * the byte-plumbing row shape used by [[frameSample]] and
    * [[multimodalStats]] (octet lengths, byte extraction are the same
    * code any opaque payload takes). */
  def withPayload(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))

  /** `documents` with a REAL generated PNG payload per row — the image
    * twin of [[withPayload]]. Rendering happens executor-side, one
    * record at a time. */
  def pngPayloads(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      // null-text docs have nothing to render; drop them the way the
      // oracle's NULL dims drop out of its joins (P4 semantics) instead
      // of NPE-ing the task
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, text) =>
        val n = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
        val (w, h) = genDims(n)
        Media(id, src, renderPng(id, w, h))
      })
  }

  /** Batch decode over partitions: iterator-in/iterator-out, one codec
    * call per record, malformed payloads dropped (P4 reject semantics).
    * `checksum` is the decoded raster's RGB sum. */
  def decodeAll(media: Dataset[Media]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodePng(m.payload).map { img =>
        DecodedMeta(m.doc_id, m.source, m.payload.length.toLong,
          img.getWidth.toLong, img.getHeight.toLong,
          img.getColorModel.getNumComponents.toLong, rgbSum(img))
      }
    })
  }

  /** Batch resize: decode, bound the longer side to `maxSide`
    * (nearest-neighbor), re-encode. Payloads already within bounds pass
    * through byte-identical (no decode/re-encode round trip is forced
    * on them); malformed payloads are dropped. */
  def resizeAll(media: Dataset[Media], maxSide: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodePng(m.payload).map { img =>
        val small = resizeRaster(img, maxSide)
        if (small eq img) m else Media(m.doc_id, m.source, encodePng(small))
      }
    })
  }

  /** The codec-roundtrip query: render → PNG-encode → decode → resize →
    * re-encode → re-decode, reporting decoded dimensions, channel
    * count, and raster checksums of BOTH generations. Every output
    * column is recomputed by the oracle from [[pixelValue]]/[[genDims]]
    * arithmetic alone, so any codec defect (wrong header parse, lossy
    * roundtrip, wrong resize mapping) hash-mismatches. */
  def multimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pngPayloads(spark, sfDir).mapPartitions(_.flatMap { m =>
      decodePng(m.payload).map { img =>
        val small = resizeRaster(img, ResizeMaxSide)
        val img2 = decodePng(encodePng(small)).getOrElse(
          throw new IllegalStateException(s"re-encoded PNG unreadable for doc ${m.doc_id}"))
        DecodedRoundtrip(m.doc_id, m.source,
          img.getWidth.toLong, img.getHeight.toLong,
          img.getColorModel.getNumComponents.toLong, rgbSum(img),
          img2.getWidth.toLong, img2.getHeight.toLong, rgbSum(img2))
      }
    }).toDF().orderBy(col("doc_id").asc)
  }

  /** DuckDB twin of [[multimodalDecode]]: dimensions from [[genDims]],
    * checksums by summing [[pixelValue]] over a bounded range() grid
    * (the resized sum maps each target pixel back to its integer
    * nearest-neighbor source, mirroring [[resizeRaster]]). */
  val multimodalDecodeSql: String =
    s"""WITH d AS (SELECT doc_id, source, octet_length(encode(text)) AS n FROM documents),
       |dims AS (SELECT doc_id, source,
       |                CAST(1 + n % $DimMod AS BIGINT) AS w,
       |                CAST(1 + (n // 7) % $DimMod AS BIGINT) AS h FROM d),
       |r AS (SELECT doc_id, source, w, h,
       |        CASE WHEN greatest(w, h) <= $ResizeMaxSide THEN w
       |             ELSE greatest(1, w * $ResizeMaxSide // greatest(w, h)) END AS rw,
       |        CASE WHEN greatest(w, h) <= $ResizeMaxSide THEN h
       |             ELSE greatest(1, h * $ResizeMaxSide // greatest(w, h)) END AS rh
       |      FROM dims),
       |op AS (SELECT doc_id,
       |         CAST(SUM((doc_id*7 + x.range*3 + y.range*5) % 256
       |                + (doc_id*7 + x.range*3 + y.range*5 + 11) % 256
       |                + (doc_id*7 + x.range*3 + y.range*5 + 22) % 256) AS BIGINT) AS pixel_sum
       |       FROM r, range($DimMod) x, range($DimMod) y
       |       WHERE x.range < w AND y.range < h
       |       GROUP BY doc_id),
       |rp AS (SELECT doc_id,
       |         CAST(SUM((doc_id*7 + (x.range * w // rw)*3 + (y.range * h // rh)*5) % 256
       |                + (doc_id*7 + (x.range * w // rw)*3 + (y.range * h // rh)*5 + 11) % 256
       |                + (doc_id*7 + (x.range * w // rw)*3 + (y.range * h // rh)*5 + 22) % 256) AS BIGINT) AS r_pixel_sum
       |       FROM r, range($ResizeMaxSide) x, range($ResizeMaxSide) y
       |       WHERE x.range < rw AND y.range < rh
       |       GROUP BY doc_id)
       |SELECT r.doc_id, r.source, r.w AS width, r.h AS height,
       |       CAST(3 AS BIGINT) AS channels, op.pixel_sum,
       |       r.rw AS r_width, r.rh AS r_height, rp.r_pixel_sum
       |FROM r JOIN op USING (doc_id) JOIN rp USING (doc_id)
       |ORDER BY doc_id ASC""".stripMargin

  // ——————————————————————— video (frame container) ———————————————————————
  // The third modality. The JDK ships no video codec, so the CONTAINER
  // is this pipeline's own deterministic format — magic + frame count +
  // length-prefixed frames — but each frame is a REAL PNG through the
  // same javax.imageio chain as the image path: the parse → seek →
  // per-frame decode work is genuine codec plumbing, and every decoded
  // raster is oracle-recomputed arithmetically like multimodal_decode.

  /** One decoded frame row of [[multimodalVideo]]. */
  case class FrameMeta(doc_id: Long, frame_no: Long,
                       width: Long, height: Long, pixel_sum: Long)

  /** Container magic ("GVID") + per-doc frame count in [1, VideoMaxFrames]. */
  val VideoMagic: Array[Byte] = "GVID".getBytes("US-ASCII")
  val VideoMaxFrames = 3

  /** Frame f of document d renders the raster of pseudo-document
    * d·131 + f — same [[pixelValue]] arithmetic, shifted per frame so
    * consecutive frames differ deterministically. */
  def videoFrameId(docId: Long, frame: Int): Long = docId * 131 + frame

  /** Generator frame count for a payload of `n` text bytes. */
  def videoFrameCount(n: Long): Int = (1 + n % VideoMaxFrames).toInt

  /** Encode the container: magic, int32 frame count, then each frame as
    * int32 length + PNG bytes (big-endian, via DataOutputStream). */
  def renderVideo(docId: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(VideoMagic)
    out.writeInt(nFrames)
    (0 until nFrames).foreach { f =>
      val png = renderPng(videoFrameId(docId, f), w, h)
      out.writeInt(png.length)
      out.write(png)
    }
    out.flush()
    bos.toByteArray
  }

  /** Real container parse + per-frame PNG decode. `None` for malformed
    * payloads: wrong magic, truncated header, frame length running past
    * the payload, or any frame failing PNG decode (P4 semantics — one
    * bad frame rejects the document, it cannot half-decode). */
  def decodeVideo(payload: Array[Byte]): Option[Seq[BufferedImage]] =
    try {
      val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!java.util.Arrays.equals(magic, VideoMagic)) None
      else {
        val n = in.readInt()
        if (n < 1 || n > 1024) None
        else {
          val frames = (0 until n).map { _ =>
            val len = in.readInt()
            if (len < 0 || len > payload.length) throw new java.io.EOFException
            val buf = new Array[Byte](len)
            in.readFully(buf)
            decodePng(buf).getOrElse(throw new java.io.IOException("bad frame"))
          }
          Some(frames)
        }
      }
    } catch { case NonFatal(_) => None }

  /** `documents` with a generated multi-frame video payload per row. */
  def videoPayloads(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, text) =>
        val n = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
        val (w, h) = genDims(n)
        Media(id, src, renderVideo(id, videoFrameCount(n), w, h))
      })
  }

  /** The parse-and-decode-to-frames transform shared by the batch query
    * and the streaming ingest ([[graft.streaming.MediaStream]]) — the
    * video twin of [[audioStats]]'s shared-transform rule: decode is
    * per-row pure, so ONE function serves both and the twins cannot
    * drift. */
  def videoFrames(media: Dataset[Media]): Dataset[FrameMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodeVideo(m.payload).toSeq.flatMap { frames =>
        frames.zipWithIndex.map { case (img, f) =>
          FrameMeta(m.doc_id, f.toLong,
            img.getWidth.toLong, img.getHeight.toLong, rgbSum(img))
        }
      }
    })
  }

  /** The video decode query: render → container-encode → parse →
    * per-frame PNG decode, one row per frame with the decoded raster
    * checksum — all recomputed by the oracle from
    * [[pixelValue]]/[[genDims]]/[[videoFrameCount]] arithmetic. */
  def multimodalVideo(spark: SparkSession, sfDir: String): DataFrame =
    videoFrames(videoPayloads(spark, sfDir))
      .toDF().orderBy(col("doc_id").asc, col("frame_no").asc)

  /** DuckDB twin of [[multimodalVideo]]: one row per (doc, frame) from
    * a bounded range() grid, checksum = Σ [[pixelValue]] with the
    * frame-shifted pseudo-document id. */
  val multimodalVideoSql: String =
    s"""WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
       |dims AS (SELECT doc_id,
       |                CAST(1 + n % $DimMod AS BIGINT) AS w,
       |                CAST(1 + (n // 7) % $DimMod AS BIGINT) AS h,
       |                CAST(1 + n % $VideoMaxFrames AS BIGINT) AS nf
       |         FROM d),
       |fr AS (SELECT doc_id, w, h, CAST(f.range AS BIGINT) AS frame_no,
       |              doc_id * 131 + f.range AS fid
       |       FROM dims, range($VideoMaxFrames) f
       |       WHERE f.range < nf),
       |px AS (SELECT doc_id, frame_no,
       |         CAST(SUM((fid*7 + x.range*3 + y.range*5) % 256
       |                + (fid*7 + x.range*3 + y.range*5 + 11) % 256
       |                + (fid*7 + x.range*3 + y.range*5 + 22) % 256) AS BIGINT) AS pixel_sum
       |       FROM fr, range($DimMod) x, range($DimMod) y
       |       WHERE x.range < w AND y.range < h
       |       GROUP BY doc_id, frame_no)
       |SELECT fr.doc_id, fr.frame_no, fr.w AS width, fr.h AS height, px.pixel_sum
       |FROM fr JOIN px USING (doc_id, frame_no)
       |ORDER BY fr.doc_id ASC, fr.frame_no ASC""".stripMargin

  // ——————————————————————— audio (WAV) ———————————————————————
  // The second modality a training pipeline carries, built exactly like
  // the PNG path: payloads synthesized from a deterministic sample
  // function of (doc_id, sample index), encoded/decoded through the
  // JDK's javax.sound.sampled (no external libraries), with every
  // reported column recomputable by the oracle in pure integer
  // arithmetic — so a codec defect (wrong header parse, byte-order
  // slip, dropped frames) hash-mismatches rather than hiding.

  /** One decoded-audio row: real WAV decode of a generated payload. */
  case class AudioMeta(doc_id: Long, source: String,
                       sample_rate: Long, n_samples: Long, duration_us: Long,
                       peak_abs: Long, sum_abs: Long, sum_sq: Long)

  /** Generated clips have 8 + (textBytes % AudioSampleMod) samples. */
  val AudioSampleMod = 64

  /** The deterministic 16-bit PCM sample both engines compute: sample
    * `i` of document `docId`, in [-32768, 32767]. */
  def sampleValue(docId: Long, i: Int): Int =
    (((docId * 13 + i * 7) % 65536L) - 32768L).toInt

  /** Generator (sample count, sample rate) for a payload of `n` text
    * bytes — rate varies across documents so the header parse is
    * actually exercised. */
  def audioDims(n: Long): (Int, Int) =
    ((8 + n % AudioSampleMod).toInt, (8000 + (n % 4) * 4000).toInt)

  /** Render the deterministic PCM clip for `docId` and encode it as a
    * real RIFF/WAVE payload via the JDK encoder (16-bit signed mono,
    * little-endian). */
  def renderWav(docId: Long, nSamples: Int, rate: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = sampleValue(docId, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real decode. `None` for malformed payloads — garbage, truncated
    * headers, or containers no installed reader claims (P4 reject
    * semantics, like [[decodePng]]). Returns the parsed format and the
    * raw PCM frame bytes. */
  def decodeWav(payload: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try Some((ais.getFormat, ais.readAllBytes())) finally ais.close()
    } catch { case NonFatal(_) => None }

  /** `documents` with a REAL generated WAV payload per row — the audio
    * twin of [[pngPayloads]]. */
  def wavPayloads(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, text) =>
        val n = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
        val (ns, rate) = audioDims(n)
        Media(id, src, renderWav(id, ns, rate))
      })
  }

  /** The audio codec query: render → WAV-encode → decode, reporting the
    * parsed rate, frame count, exact integer duration, and the decoded
    * signal's peak/abs-sum/square-sum — all recomputed by the oracle
    * from [[sampleValue]]/[[audioDims]] arithmetic alone. RMS and dBFS
    * are one IEEE sqrt/log away from (sum_sq, n_samples); the report
    * keeps the exact integers so the hash compare stays bit-stable. */
  /** Signal stats of a decoded clip. The sample loop reads 16-bit
    * signed little-endian mono; [[decodeWav]] accepts anything an
    * installed reader claims (AIFF is big-endian, WAV can be 8-bit or
    * stereo), so any other parsed format is REJECTED like a malformed
    * payload (P4) rather than silently misread or walked past the
    * array bounds. Returns (rate, n_samples, peak, sum_abs, sum_sq). */
  def pcmStats(fmt: javax.sound.sampled.AudioFormat,
               pcm: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
    val pcm16leMono =
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian &&
        // the JDK reader parses a declared rate of 0 (or garbage) without
        // validation; rejecting it here keeps duration_us = n·10⁶/rate
        // from dividing by zero and killing the task — P4, not a crash
        fmt.getSampleRate >= 1f && !fmt.getSampleRate.isInfinite
    if (!pcm16leMono) None
    else {
      val nSamples = pcm.length / fmt.getFrameSize
      var (peak, sumAbs, sumSq) = (0L, 0L, 0L)
      var i = 0
      while (i < nSamples) {
        val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toLong
        val a = math.abs(s)
        peak = math.max(peak, a); sumAbs += a; sumSq += s * s
        i += 1
      }
      Some((fmt.getSampleRate.toLong, nSamples.toLong, peak, sumAbs, sumSq))
    }
  }

  /** A quarantined payload: which document, how many bytes arrived,
    * and WHY the decoder refused it. */
  case class MediaVerdict(doc_id: Long, source: String, n_bytes: Long,
                          reason: String)

  /** The REJECT side of [[audioStats]] — one row per payload the audio
    * decode path drops, with the reason. Complements the decoded set
    * by construction: both sides call the same [[decodeWav]] /
    * [[pcmStats]], so a payload appears in exactly one of them. This
    * is what makes P4 drops OBSERVABLE: a poisoned media feed shows up
    * in a quarantine sink with counts and reasons, not as silently
    * shrinking output. */
  def audioRejects(media: Dataset[Media]): Dataset[MediaVerdict] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      if (m.payload == null)
        Some(MediaVerdict(m.doc_id, m.source, 0L, "null_payload"))
      else decodeWav(m.payload) match {
        case None =>
          Some(MediaVerdict(m.doc_id, m.source, m.payload.length.toLong,
            "wav_decode_failed"))
        case Some((fmt, pcm)) =>
          if (pcmStats(fmt, pcm).isEmpty)
            Some(MediaVerdict(m.doc_id, m.source, m.payload.length.toLong,
              "unsupported_pcm_format"))
          else None
      }
    })
  }

  /** The reject side of [[videoFrames]] — same contract as
    * [[audioRejects]] over the container parser (a corrupt frame
    * rejects its whole document, so the verdict is per document). */
  def videoRejects(media: Dataset[Media]): Dataset[MediaVerdict] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      if (m.payload == null)
        Some(MediaVerdict(m.doc_id, m.source, 0L, "null_payload"))
      else if (decodeVideo(m.payload).isEmpty)
        Some(MediaVerdict(m.doc_id, m.source, m.payload.length.toLong,
          "video_parse_failed"))
      else None
    })
  }

  /** The decode-to-stats transform shared by the batch query and the
    * streaming ingest ([[graft.streaming.MediaStream]]): decode is
    * per-row pure, so ONE function serves both frame kinds and the
    * twins cannot drift. */
  def audioStats(media: Dataset[Media]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodeWav(m.payload).flatMap { case (fmt, pcm) =>
        pcmStats(fmt, pcm).map { case (rate, n, peak, sumAbs, sumSq) =>
          AudioMeta(m.doc_id, m.source,
            rate, n, n * 1000000L / rate, peak, sumAbs, sumSq)
        }
      }
    })
  }

  def multimodalAudio(spark: SparkSession, sfDir: String): DataFrame =
    audioStats(wavPayloads(spark, sfDir)).toDF().orderBy(col("doc_id").asc)

  /** DuckDB twin of [[multimodalAudio]]: sample count and rate from
    * [[audioDims]], signal stats by summing [[sampleValue]] over a
    * bounded range() grid — mirrors the PNG oracle's shape. */
  val multimodalAudioSql: String =
    s"""WITH d AS (SELECT doc_id, source, octet_length(encode(text)) AS n FROM documents),
       |p AS (SELECT doc_id, source,
       |             CAST(8 + n % $AudioSampleMod AS BIGINT) AS n_samples,
       |             CAST(8000 + (n % 4) * 4000 AS BIGINT) AS sample_rate
       |      FROM d),
       |s AS (SELECT doc_id,
       |        CAST(MAX(abs((doc_id*13 + i.range*7) % 65536 - 32768)) AS BIGINT) AS peak_abs,
       |        CAST(SUM(abs((doc_id*13 + i.range*7) % 65536 - 32768)) AS BIGINT) AS sum_abs,
       |        CAST(SUM(((doc_id*13 + i.range*7) % 65536 - 32768)
       |               * ((doc_id*13 + i.range*7) % 65536 - 32768)) AS BIGINT) AS sum_sq
       |      FROM p, range(${8 + AudioSampleMod}) i
       |      WHERE i.range < n_samples
       |      GROUP BY doc_id)
       |SELECT p.doc_id, p.source, p.sample_rate, p.n_samples,
       |       CAST(p.n_samples * 1000000 // p.sample_rate AS BIGINT) AS duration_us,
       |       s.peak_abs, s.sum_abs, s.sum_sq
       |FROM p JOIN s USING (doc_id)
       |ORDER BY p.doc_id ASC""".stripMargin

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

  /** Oracle-backed stats over the multimodal rows: byte totals plus the
    * pixel volume of the PNGs [[pngPayloads]] generates ([[genDims]] ×
    * 3 channels) — pure integer arithmetic, identical in DuckDB. */
  def multimodalStats(spark: SparkSession, sfDir: String): DataFrame = {
    val nBytes = length(col("text").cast("binary")).cast("long")
    val width = lit(1L) + nBytes % DimMod
    val height = lit(1L) + floor(nBytes / 7) % DimMod
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
    s"""SELECT source,
       |       COUNT(*) AS n_docs,
       |       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       |       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
       |       CAST(SUM((1 + n_bytes % $DimMod) * (1 + (n_bytes // 7) % $DimMod) * 3) AS BIGINT) AS total_pixels
       |FROM (SELECT source, octet_length(encode(text)) AS n_bytes FROM documents)
       |GROUP BY source
       |ORDER BY source ASC""".stripMargin
}
