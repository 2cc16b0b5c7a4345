package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.{Curation, DedupOps, TextAnalysis}

/** Streaming ingest-curation for documents: the streaming twin of the
  * batch curation surface, for corpora that ARRIVE continuously
  * (crawl output landing in a directory) rather than sitting still.
  *
  * Every transform is the IDENTICAL column expression the batch
  * operators run — quality from `TextAnalysis.qualityCols`, the
  * 120-bit content hash from `TextOps.hash60/hash60b`, the language
  * allowlist from `Curation` — so the semantics verified against the
  * DuckDB oracle in batch carry over unchanged, and the same function
  * applied to a batch frame IS the batch result (tested).
  *
  * Scale design: [[curateStream]] is fully STATELESS — per-row
  * projections and filters only, so it scales with input rate, never
  * with stream length, and needs no watermark. The only stateful step
  * is the optional exact-dedup ([[dedupedStream]]); its state is
  * bounded the same way as `EventStream.dedupEvents` — by an
  * ingest-time watermark — because an unbounded `dropDuplicates` keeps
  * every content hash ever seen.
  */
object DocStream {

  /** File-source stream over a directory where documents parquet files
    * land; `maxFilesPerTrigger` bounds micro-batch size. */
  def readDocsStream(spark: org.apache.spark.sql.SparkSession, dir: String,
                     maxFilesPerTrigger: Int = 1): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
  }

  /** Stateless curation filter: language allowlist + quality gate +
    * content hashes, one codegen'd pass per row. Works identically on
    * streaming and batch frames. */
  def curateStream(docs: DataFrame): DataFrame = {
    val (nTokens, quality) = TextAnalysis.qualityCols(col("text"))
    val norm = TextOps.normText(col("text"))
    val h = TextOps.hash120(norm)
    docs
      .where(col("text").isNotNull &&
        col("lang").isin(Curation.LangAllow.map(l => l: Any): _*))
      .select(col("doc_id"), col("source"), col("lang"),
        nTokens.as("n_tokens"), quality.as("quality"),
        h.getField("h1").as("content_hash"),
        h.getField("h2").as("content_hash_b"))
      .where(col("quality") >= Curation.QualityMin)
  }

  /** DuckDB twin of [[curateStream]] applied to the batch table —
    * closes the verification chain: the spec proves streamed == batch,
    * and the `curate_filter` oracle query proves batch == DuckDB, so
    * the streaming filter's exact expressions are oracle-verified. */
  val curateBatchSql: String =
    s"""WITH q AS (${TextAnalysis.qualityScoreSql})
       |SELECT d.doc_id, d.source, d.lang, q.n_tokens, q.quality,
       |       ${TextOps.hash60Sql(TextOps.normTextSql("d.text"))} AS content_hash,
       |       ${TextOps.hash60bSql(TextOps.normTextSql("d.text"))} AS content_hash_b
       |FROM documents d
       |JOIN q ON d.doc_id = q.doc_id
       |WHERE d.text IS NOT NULL
       |  AND d.lang IN (${Curation.LangAllow.map(l => s"'$l'").mkString(", ")})
       |  AND q.quality >= ${Curation.QualityMin}
       |ORDER BY d.doc_id ASC""".stripMargin

  /** Stateless PII redaction at ingest — the pass a crawl pipeline runs
    * BEFORE any downstream operator sees the text: the identical Column
    * expressions as the oracle-verified batch `text_redact`
    * ([[TextAnalysis.redactCols]] is the single definition), one
    * codegen'd pass per row, works on streaming and batch frames
    * alike. Emits match counts and the redacted-text hash alongside the
    * carried metadata; a production variant would carry the redacted
    * text itself in place of the hash. */
  def redactStream(docs: DataFrame): DataFrame = {
    val (nEmails, nNums, redHash) = TextAnalysis.redactCols
    docs
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("lang"),
        nEmails.as("n_emails"), nNums.as("n_longnums"),
        redHash.as("redacted_hash"))
  }

  /** Stateless BM25 scoring at ingest — the text twin of the embedding
    * stream's trained-centroid serving: corpus statistics (doc count,
    * total tokens, per-term df) are TRAINED once by the batch side
    * ([[graft.operators.Retrieval.bm25Train]]) and baked into the
    * streaming projection as plan literals, so each arriving document
    * is scored in one codegen'd pass with zero streaming state and no
    * shuffle. Scores are bit-identical to the batch operator evaluated
    * with the same stats (shared Column builders), so a relevance gate
    * at ingest ranks exactly like the oracle-verified batch query.
    *
    * Staleness contract (spec-pinned, `RetrievalSpec`): per-document
    * inputs (tf, dl) come from the arriving row itself and are NEVER
    * stale — only the three corpus aggregates (nd, tt, dfs) age as
    * the corpus grows, so ALL drift is attributable to the literals
    * and re-training restores bit-exact agreement with the batch
    * scorer over the grown corpus. The drift itself is bounded by how
    * far term RATES move: appends that preserve them leave avgdl =
    * tt/nd fixed (tf normalization exact) and perturb each idf_t by
    * O(1/df_t) — measured ≈ 0.2 % on a corpus-doubling append at the
    * suite fixture (df_t ≈ 10²). The
    * re-train cadence therefore tracks rate shift, not volume: a
    * pipeline retrains when the incoming term-rate distribution
    * moves, exactly like the dedup incremental path re-clusters when
    * its delta == full-recompute invariant is threatened. */
  def bm25ScoreStream(docs: DataFrame,
      index: graft.operators.Retrieval.Bm25Index): DataFrame = {
    import graft.operators.Retrieval
    val perDoc = Retrieval.bm25PerDoc(docs)
    val (nTerms, score) = Retrieval.bm25ScoreCols(
      lit(index.nd), lit(index.tt), i => lit(index.dfs(i)))
    perDoc.where(Retrieval.bm25AnyMatch)
      .select(col("doc_id"), nTerms.as("n_terms"), score.as("score"))
  }

  /** One near-dedup signature row per streamed document. */
  case class DocSignature(doc_id: Long, source: String, lang: String,
                          content_hash: Long, content_hash_b: Long,
                          minhash: Option[Seq[Long]],
                          simhash_lo: Option[Long], simhash_hi: Option[Long])

  /** Stateless near-dedup SIGNATURE extraction — the streaming half of
    * the continuous-signature → periodic-band architecture a crawl
    * pipeline needs: near-dup discovery requires comparing documents
    * ACROSS the whole corpus (the band self-join), which no bounded
    * streaming state can hold, so the stream does the per-document
    * O(doc)-cost part — MinHash and SimHash signatures plus the exact
    * 120-bit content hash — and lands slim signature rows continuously;
    * a periodic BATCH job then runs the oracle-verified band joins
    * (`DedupOps.minhashCandidates` / `simhashNearDups` shapes) over the
    * accumulated signature table, touching only ~100 bytes per doc
    * instead of re-reading text. Signatures never expire, so the batch
    * banding is incremental-friendly: new signatures join against the
    * full history by bucket key.
    *
    * Correctness chain, same as [[curateStream]]: the content hashes
    * are the identical Column expressions the batch operators run; the
    * token/shingle hashing mirrors [[TextOps.hash60]]/[[TextOps.hash60b]]
    * exactly (same md5, hex chars 1–15 / 16–30 — one digest serves both
    * halves, as the batch scalar path's common-subexpression sharing
    * does), and the signature arithmetic reuses the batch
    * implementations themselves — `SimhashSigAgg.reduce/finish` for the
    * vote-and-pack, `TextOps.permA/permB` for the permutation mins. The
    * spec pins streamed output against both oracle-verified batch
    * operators, so any drift between the JVM mirror and the Column
    * expressions fails the build. (Why not Column HOFs here: three
    * interpreted lambdas would each re-inline the tokenizer per row —
    * the project-collapse trap `DedupOps.shingleHashes` documents; the
    * typed path tokenizes once and hashes each token once.)
    *
    * Docs with no tokens get null simhash halves; docs shorter than
    * [[DedupOps.ShingleK]] tokens get a null minhash — mirroring the
    * batch operators, where such docs simply have no signature rows. */
  def signatureStream(docs: DataFrame): Dataset[DocSignature] = {
    import docs.sparkSession.implicits._
    val norm = TextOps.normText(col("text"))
    val half = DedupOps.SimHashHalfBits
    val k = DedupOps.ShingleK
    val hc = TextOps.hash120(norm)
    docs
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("lang"),
        hc.getField("h1").as("content_hash"),
        hc.getField("h2").as("content_hash_b"),
        col("text"))
      .as[(Long, String, String, Long, Long, String)]
      .mapPartitions { rows =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        val agg = new graft.functions.SimhashSigAgg(half)
        // both 60-bit halves from ONE digest — hex chars 1-15 and 16-30,
        // exactly TextOps.hash60/hash60b
        def hashPair(s: String): (Long, Long) = {
          val hex = md5.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map(x => f"$x%02x").mkString
          (java.lang.Long.parseLong(hex.substring(0, 15), 16),
            java.lang.Long.parseLong(hex.substring(15, 30), 16))
        }
        rows.map { case (id, src, lang, ch, chb, text) =>
          // Spark's split(text, " ") is the same regex split with -1 limit
          val toks = text.split(" ", -1).filter(_.nonEmpty)
          val pairs = toks.map(hashPair)
          val mh =
            if (toks.length < k) None
            else {
              val sh = toks.sliding(k).map(w => hashPair(w.mkString(" "))._1).toArray
              Some((0 until DedupOps.NumHashes).map { i =>
                val (a, b, p) = (TextOps.permA(i), TextOps.permB(i), TextOps.MinHashPrime)
                sh.iterator.map(h => (a * (h % p) + b) % p).min
              })
            }
          val (lo, hi) =
            if (pairs.isEmpty) (None, None)
            else {
              val packed = agg.finish(pairs.foldLeft(agg.zero)(agg.reduce))
              (Some(packed._1), Some(packed._2))
            }
          DocSignature(id, src, lang, ch, chb, mh, lo, hi)
        }
      }
  }

  /** One online LSH candidate: docs `doc_a < doc_b` sharing minhash
    * band `band_id`. */
  case class CandidatePair(doc_a: Long, doc_b: Long, band_id: Int)

  /** ONLINE LSH band join — streaming near-dedup candidates, not just
    * signatures: as signature rows arrive (from [[signatureStream]]),
    * each doc's band rows meet their bucket's earlier members in
    * per-bucket streaming state, and candidate pairs are emitted the
    * moment the second member lands. This is the
    * `flatMapGroupsWithState` form of `DedupOps.bandPairs`: the group
    * key IS the join key (band_id, band_key), so state is partitioned
    * exactly like the batch shuffle, and each bucket's state is its
    * member doc ids, hard-capped at `spark.graft.minhash.bucketCap` —
    * state per key is bounded no matter how hot a boilerplate bucket
    * runs.
    *
    * Cap semantics vs batch: the batch operator drops an over-cap
    * bucket RETROACTIVELY (it sees final occupancy); a streaming
    * operator cannot un-emit, so it stops emitting once a bucket
    * reaches the cap — the first `cap` arrivals pair, later ones don't
    * (arrival order is deterministic per micro-batch: ids sorted). Under
    * the cap the two are IDENTICAL, which the spec pins by comparing
    * streamed pairs+band-counts against `minhashCandidates`. Production
    * crawls add an event-time TTL on the state; the fixture documents
    * carry no event time, so buckets here live for the stream. */
  def candidateStream(sigs: DataFrame): Dataset[CandidatePair] = {
    import sigs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val cap = graft.GraftConf.minhashBucketCap(sigs.sparkSession)
    val rpb = DedupOps.RowsPerBand
    val bandStructs = (0 until DedupOps.NumBands).map { b =>
      struct(lit(b).as("band_id"),
        concat_ws("_", (0 until rpb).map(j =>
          element_at(col("minhash"), b * rpb + j + 1)): _*).as("band_key"))
    }
    sigs.where(col("minhash").isNotNull)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band_id").as("band_id"), col("bb.band_key").as("band_key"))
      .as[(Long, Int, String)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, String), rows: Iterator[(Long, Int, String)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Long]]) =>
          var members = state.getOption.getOrElse(Array.empty[Long])
          val out = Seq.newBuilder[CandidatePair]
          // sorted for deterministic within-batch arrival order
          rows.map(_._1).toArray.distinct.sorted.foreach { d =>
            if (!members.contains(d) && members.length < cap) {
              members.foreach(m =>
                out += CandidatePair(math.min(m, d), math.max(m, d), key._1))
              members = members :+ d
            }
          }
          state.update(members)
          out.result().iterator
      }
  }

  /** Streaming eval-decontamination, stream half: emit the matched
    * (corpus_doc, h) rows — each arriving document's distinct shingle
    * hashes intersected with the STATIC eval-set hash frame via a
    * stream-static equi-join (stateless; Spark broadcasts the small
    * static side per micro-batch). Of a crawl's ~10^13 shingles only
    * the eval-matched handful are ever emitted, exactly like the batch
    * operator's map-side semi-join. The periodic batch tail
    * ([[graft.operators.Decontamination.overlapFromMatched]]) then
    * judges rarity and counts pairs over the accumulated matched rows —
    * the same continuous-land/periodic-aggregate architecture as
    * [[signatureStream]]. Per-doc shingle dedup is row-local
    * (`array_distinct` at the HASH level, matching the batch
    * `.distinct()` and the oracle's hash-level DISTINCT), so no
    * streaming state is needed anywhere. */
  def contaminationStream(docs: DataFrame, evalHashes: DataFrame): DataFrame = {
    val k = graft.operators.Decontamination.ShingleK
    // distinct over ALL window hashes == distinct over the hashed
    // distinct-shingle set (first-occurrence order is preserved either
    // way), so the ngram_hash60 kernel serves the streaming twin too
    val hs = array_distinct(TextOps.ngramHash60(TextOps.tokens(col("text")), k))
    docs.where(col("text").isNotNull)
      .select(col("doc_id").as("corpus_doc"), explode(hs).as("h"))
      .join(evalHashes.select(col("h")), "h")
      .select(col("corpus_doc"), col("h"))
  }

  /** Stateless streaming chunking: the identical
    * [[graft.operators.Chunking.chunkCols]] projection the
    * oracle-verified batch query runs, applied to a document stream —
    * chunk boundaries are per-document, so no state or watermark is
    * needed and throughput scales with input rate. The downstream shape
    * is the same as [[signatureStream]]: slim chunk rows land
    * continuously for a periodic batch job (embed, pack, index) to
    * consume. */
  def chunkStream(docs: DataFrame): DataFrame =
    graft.operators.Chunking.chunkCols(docs)

  /** Stateless streaming OOV monitor — the tokenizer-drift signal over
    * a live feed: each arriving document is scored against a FIXED
    * induced vocabulary (the broadcast-sized artifact from
    * [[TextAnalysis.vocabTerms]], baked into the projection as a
    * literal array exactly like the batch operator's one-row broadcast),
    * emitting slim (doc_id, source, n_tok, n_oov) rows. A periodic
    * batch job aggregates per source and compares against the
    * vocabulary's training-time OOV profile — rising OOV on a source
    * means the mixture drifted and the tokenizer needs retraining. Same
    * continuous-land/periodic-aggregate architecture as
    * [[signatureStream]]; no state, no watermark, throughput scales
    * with input rate. The spec pins streamed rows == the batch
    * projection and their per-source sums == the oracle-verified
    * `oov_rate` aggregates. */
  def oovStream(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    val varr = array(vocab.map(lit): _*)
    val t = TextOps.tokens(TextOps.normText(col("text")))
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(t).cast("long").as("n_tok"),
        size(filter(t, tk => !array_contains(varr, tk))).cast("long").as("n_oov"))
  }

  /** Streaming per-source quality-distribution monitor, accumulate
    * half: the SAME (source, qbin) histogram aggregate as the batch
    * [[TextAnalysis.qualityHist]] (shared expression tree), run in
    * complete/update mode over a live feed. State is O(sources × grid)
    * — hard-bounded by the 10⁻⁴ quality grid regardless of corpus
    * size, the streaming analogue of a KLL sketch with the same
    * determinism argument as the batch grid. A periodic reader replays
    * the exact type-7 tail ([[TextAnalysis.quantilesFromQualityHist]])
    * over the landed histogram; the spec pins that read ==
    * the oracle-verified `quality_quantiles_grid` batch query — the
    * continuous-land / periodic-tail architecture of
    * `EventStream.hourlyCounts` + `trailingRatioFromHourly`. */
  def qualityHistStream(docs: DataFrame): DataFrame =
    TextAnalysis.qualityHist(docs)

  /** Streaming quarantine: per arriving document, emit one
    * (doc_id, rule) row for EVERY [[graft.operators.DataQuality]]
    * document rule it violates — the reject-side complement of
    * [[curateStream]], with reasons, feeding a quarantine sink instead
    * of silently dropping rows. Stateless (the rule battery is one
    * projection; `explode` of the failed-rule array emits nothing for
    * clean docs), so throughput scales with input rate and the batch
    * twin is the IDENTICAL expression tree — spec-pinned, with the
    * per-rule counts reconciled against the oracle-verified `dq_docs`
    * report. */
  def violationsStream(docs: DataFrame): DataFrame = {
    val fired = array(graft.operators.DataQuality.DocumentRules.map {
      case (name, pred) => when(expr(pred), lit(name))
    }: _*)
    docs.select(col("doc_id"), explode(filter(fired, x => x.isNotNull)).as("rule"))
  }

  /** Exact content-dedup on top of [[curateStream]], state bounded by
    * an INGEST-time watermark (the fixture documents carry no event
    * time, so arrival time is the only clock — the standard shape for
    * crawl feeds): duplicates delivered within the window are dropped,
    * state older than it is reclaimed. At-least-once feeds re-deliver
    * within bounded windows, which is exactly what this bounds to. */
  def dedupedStream(curated: DataFrame, watermark: String = "2 hours"): DataFrame =
    curated
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash", "content_hash_b")
      .drop("ingest_ts")
}
