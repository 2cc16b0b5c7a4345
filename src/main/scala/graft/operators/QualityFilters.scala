package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables

/** Repetition-based document quality filters — the Gopher-style
  * signals (duplicate-token fraction, duplicate-bigram fraction,
  * duplicate-character mass, most-common-token share) a training-data
  * pipeline runs before anything expensive touches a document.
  *
  * Scale design:
  *  - Two explode→aggregate pipelines (token counts, bigram counts),
  *    each a partial+final HashAggregate keyed on (doc_id, term) — the
  *    shuffle carries short term strings and 8-byte counts, never
  *    documents. The per-doc rollup then shuffles only doc_id plus a
  *    handful of longs.
  *  - The two per-doc frames join on the 8-byte doc_id. At 100 TB this
  *    is two shuffles over slim rows plus a doc-count-sized join —
  *    entirely insensitive to document length skew (a pathological
  *    10 MB doc contributes many (doc, term) rows but they combine
  *    map-side before shuffling).
  *  - All fractions are single IEEE divisions over exact integer
  *    counts, so the DuckDB oracle matches bit-for-bit.
  *
  * The boolean `flagged` applies the classic thresholds (duplicate
  * bigrams > 20%, top token > 30% of the document) as one composed
  * predicate — the shape a curation job's WHERE clause takes.
  */
object QualityFilters {

  /** Duplicate-bigram fraction above this flags a document. */
  val DupBigramMax = 0.2
  /** Most-common-token share above this flags a document. */
  val TopTokenMax = 0.3

  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))

    // token-level: count per (doc, token), then roll up per doc
    val tokStats = docs
      .select(col("doc_id"), explode(col("t")).as("tk"))
      .groupBy(col("doc_id"), col("tk"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("tklen", length(col("tk")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        max(col("cnt")).as("top_cnt"),
        sum(when(col("cnt") > 1, col("cnt") * col("tklen")).otherwise(lit(0L))).as("dup_chars"),
        sum(col("cnt") * col("tklen")).as("total_chars"))

    // bigram-level: the same scalar explode-an-index n-gram shape as
    // the shingle pipeline, count per (doc, bigram), roll up
    val bgStats = docs
      .select(col("doc_id"), col("t"), explode(TextOps.ngramIndex(col("t"), 2)).as("i"))
      .select(col("doc_id"), TextOps.ngramAt(col("t"), col("i"), 2).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_bigrams"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L))).as("dup_bigrams"))

    val dupTokFrac = lit(1.0) - col("n_distinct_tokens").cast("double") / col("n_tokens")
    val topTokFrac = col("top_cnt").cast("double") / col("n_tokens")
    val dupCharFrac = col("dup_chars").cast("double") / col("total_chars")
    // single-token docs have no bigrams: left join + 0/0 guard
    val dupBgFrac = when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
      .otherwise(col("dup_bigrams").cast("double") / col("n_bigrams"))

    tokStats.join(bgStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        dupTokFrac.as("dup_token_frac"),
        topTokFrac.as("top_token_frac"),
        dupCharFrac.as("dup_char_frac"),
        dupBgFrac.as("dup_bigram_frac"))
      .withColumn("flagged",
        col("dup_bigram_frac") > DupBigramMax || col("top_token_frac") > TopTokenMax)
      .orderBy(col("doc_id").asc)
  }

  /** Corpus-bigram language-model quality score — the shape of
    * model-based filtering without a trained model: score each document
    * by how typical its bigrams are OF THIS CORPUS. Per document:
    * the mean corpus frequency of its bigram occurrences (formulaic
    * boilerplate scores high, line noise scores ≈1) and the fraction of
    * its bigrams seen nowhere else (hapax bigrams). All counts are
    * exact integers with one final IEEE division each — log-free, so
    * the DuckDB oracle matches bit-for-bit (ln differs across libm
    * implementations; a frequency ratio does not).
    *
    * Scale design: one explode→count aggregation builds the corpus
    * bigram table (map-side combined; the shuffle carries short bigram
    * strings + counts); the per-doc pass re-joins the slim (doc_id,
    * bigram) rows to it on the bigram key — a plain shuffled equi-join
    * whose hot keys (ubiquitous bigrams) AQE's skew split handles —
    * then rolls up per doc_id. Documents shorter than 2 tokens have no
    * bigrams and no row, mirroring the oracle's inner join. */
  def bigramLmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val bg = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), explode(TextOps.ngramIndex(col("t"), 2)).as("i"))
      .select(col("doc_id"), TextOps.ngramAt(col("t"), col("i"), 2).as("bg"))
    val counts = bg.groupBy(col("bg")).agg(count(lit(1)).as("c"))
    bg.join(counts, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c")).as("sum_df"),
        sum(when(col("c") === 1, lit(1L)).otherwise(lit(0L))).as("n_hapax"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_df").cast("double") / col("n_bigrams")).as("avg_bigram_df"),
        (col("n_hapax").cast("double") / col("n_bigrams")).as("hapax_frac"))
      .orderBy(col("doc_id").asc)
  }

  val bigramLmScoreSql: String =
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |              FROM documents),
       |bg0 AS (SELECT doc_id,
       |               unnest(list_transform(range(greatest(len(t) - 1, 0)),
       |                                     i -> concat_ws(' ', t[i + 1], t[i + 2]))) AS bg
       |        FROM toks),
       |bc AS (SELECT bg, COUNT(*) AS c FROM bg0 GROUP BY bg),
       |per AS (SELECT doc_id, COUNT(*) AS n_bigrams,
       |               CAST(SUM(c) AS BIGINT) AS sum_df,
       |               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
       |        FROM bg0 JOIN bc USING (bg) GROUP BY doc_id)
       |SELECT doc_id, n_bigrams,
       |       CAST(sum_df AS DOUBLE) / n_bigrams AS avg_bigram_df,
       |       CAST(n_hapax AS DOUBLE) / n_bigrams AS hapax_frac
       |FROM per
       |ORDER BY doc_id ASC""".stripMargin

  /** How many of the corpus's most-document-frequent shingles count as
    * boilerplate. An absolute top-N (not a df fraction): shingle-df
    * distributions shift with corpus size, but "the N most repeated
    * templates" is the knob a curation run actually sets. */
  val BoilerplateTopN = 100
  /** A document whose distinct shingles are this boilerplate-heavy gets
    * flagged (the C4-style template/navigation-chrome signal). */
  val BoilerplateFracMax = 0.2

  /** Boilerplate exposure per document: the corpus's [[BoilerplateTopN]]
    * highest-df shingles (ties broken by shingle hash — deterministic)
    * are the boilerplate set; each document reports how many of its
    * DISTINCT shingles fall in it.
    *
    * Scale design:
    *  - Reuses [[DedupOps.signatures]]' memoized per-doc shingle-hash
    *    sets (the same checkpointed frame every MinHash query reads), so
    *    the text→shingle→md5 pipeline runs zero extra times.
    *  - df is one hash aggregation over exploded (doc, hash) rows —
    *    8-byte shuffle keys, map-side combined.
    *  - The boilerplate set is top-N of that aggregate
    *    (TakeOrderedAndProject) and rides into the per-doc pass as a
    *    BROADCAST left join: N rows, so the per-doc side never
    *    shuffles for membership — only the final per-doc count does,
    *    keyed on the 8-byte doc_id.
    * Documents shorter than [[DedupOps.ShingleK]] tokens have no
    * shingles and no row, exactly as they drop out of the MinHash path. */
  // NOT memoized (r16): like spanDupRate, aggregate-only consumers can
  // prune parts of this plan that an eager output memo would force to
  // materialize (measured net-negative at sf0.1); the heavy shared
  // input (the shingle-hash signature frame) is already memoized by
  // DedupOps.signatures.
  def boilerplateStats(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = DedupOps.signatures(spark, sfDir, keepHs = true)
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val boiler = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("h").asc)
      .limit(BoilerplateTopN)
      .select(col("h"), lit(1L).as("is_boiler"))
    sh.join(broadcast(boiler), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        (col("n_boiler").cast("double") / col("n_shingles")).as("boiler_frac"))
      .withColumn("flagged", col("boiler_frac") > BoilerplateFracMax)
      .orderBy(col("doc_id").asc)
  }

  /** Oracle twin. Dedups at the HASH level (DISTINCT over the 60-bit
    * shingle hash, exactly like Spark's collect_set of hashes) so an
    * intra-document hash collision cannot make the engines disagree. */
  val boilerplateStatsSql: String = {
    val shingleList = TextOps.shingleListSql("t", DedupOps.ShingleK)
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |              FROM documents),
       |sh0 AS (SELECT doc_id, unnest($shingleList) AS s FROM toks),
       |sh AS (SELECT DISTINCT doc_id, ${graft.functions.TextOps.hash60Sql("s")} AS h FROM sh0),
       |boiler AS (SELECT h FROM (SELECT h, COUNT(*) AS df FROM sh GROUP BY h)
       |           ORDER BY df DESC, h ASC LIMIT $BoilerplateTopN),
       |per AS (SELECT doc_id, COUNT(*) AS n_shingles,
       |               CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
       |        FROM sh LEFT JOIN boiler b USING (h) GROUP BY doc_id)
       |SELECT doc_id, n_shingles, n_boiler,
       |       CAST(n_boiler AS DOUBLE) / n_shingles AS boiler_frac,
       |       CAST(n_boiler AS DOUBLE) / n_shingles > $BoilerplateFracMax AS flagged
       |FROM per
       |ORDER BY doc_id ASC""".stripMargin
  }

  val repetitionStatsSql: String =
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |              FROM documents),
       |tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
       |tc AS (SELECT doc_id, tk, COUNT(*) AS cnt FROM tok GROUP BY doc_id, tk),
       |ts AS (SELECT doc_id,
       |              CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       |              COUNT(*) AS n_distinct_tokens,
       |              MAX(cnt) AS top_cnt,
       |              CAST(SUM(CASE WHEN cnt > 1 THEN cnt * len(tk) ELSE 0 END) AS BIGINT) AS dup_chars,
       |              CAST(SUM(cnt * len(tk)) AS BIGINT) AS total_chars
       |       FROM tc GROUP BY doc_id),
       |bg0 AS (SELECT doc_id,
       |               unnest(list_transform(range(greatest(len(t) - 1, 0)),
       |                                     i -> concat_ws(' ', t[i + 1], t[i + 2]))) AS bg
       |        FROM toks),
       |bc AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bg0 GROUP BY doc_id, bg),
       |bs AS (SELECT doc_id,
       |              CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       |              CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_bigrams
       |       FROM bc GROUP BY doc_id)
       |SELECT ts.doc_id, n_tokens,
       |       1.0 - CAST(n_distinct_tokens AS DOUBLE) / n_tokens AS dup_token_frac,
       |       CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_frac,
       |       CAST(dup_chars AS DOUBLE) / total_chars AS dup_char_frac,
       |       CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0.0
       |            ELSE CAST(dup_bigrams AS DOUBLE) / n_bigrams END AS dup_bigram_frac,
       |       (CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0.0
       |             ELSE CAST(dup_bigrams AS DOUBLE) / n_bigrams END) > $DupBigramMax
       |         OR (CAST(top_cnt AS DOUBLE) / n_tokens) > $TopTokenMax AS flagged
       |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
       |ORDER BY ts.doc_id ASC""".stripMargin
}
