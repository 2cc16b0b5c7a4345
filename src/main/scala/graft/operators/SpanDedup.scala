package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables

/** Exact-substring (token-window) duplicate detection — the span-level
  * pass that complements the document-level dedup family: exact dedup
  * catches identical documents, MinHash/SimHash catch mostly-similar
  * documents, and THIS catches verbatim runs (boilerplate, licenses,
  * quoted passages) repeated across otherwise-distinct documents —
  * the "exact substring duplication" signal of the deduplicate-
  * training-data literature, re-expressed for Spark: instead of a
  * corpus-wide suffix array (a single-machine construction), every
  * document emits its sliding W-token windows, each window is reduced
  * to a 60-bit hash, and duplicate spans are ONE hash aggregation.
  *
  * Scale design at 100 TB:
  *  - Window construction is per-row array arithmetic (`transform` over
  *    a `sequence`, `slice` + `concat_ws`) — a map-only pass, no
  *    explosion through a shuffle until windows are reduced to hashes.
  *  - The only shuffled rows are (8-byte span hash, 8-byte doc id)
  *    pairs — never window text. A doc of n tokens emits n-W+1 such
  *    pairs; corpus-wide this is O(total tokens), the same order as a
  *    tokenization pass.
  *  - [[spanDupRate]] joins windows back to the duplicated-span counts
  *    on the SAME 8-byte hash key the aggregation shuffled on, so the
  *    exchange is reused, then aggregates per doc.
  *  - The hash is the shared md5-derived 60-bit scheme ([[TextOps
  *    .hash60]]) — deterministic across engines, so both queries have
  *    exact DuckDB oracles. At 2^60, span-hash collisions begin to
  *    matter only past ~2^30 DISTINCT spans (birthday bound); a
  *    production corpus upgrades to the two-half 120-bit scheme exact
  *    dedup already uses (same shape, twice the key bytes).
  */
object SpanDedup {

  /** Tokens per window (stride 1). Matches the W≈50-token windows of
    * the exact-substring-dedup literature in SHAPE; sized for the
    * pinned fixtures so the duplicated-span set is non-trivial. */
  val WindowTokens = 8

  /** One row per window occurrence: (doc_id, span_hash). */
  private def spanHashes(spark: SparkSession, sfDir: String): DataFrame = {
    val W = WindowTokens
    val t = TextOps.tokens(col("text"))
    val windows = when(size(col("t")) >= W,
      transform(sequence(lit(0), size(col("t")) - W),
        i => TextOps.hash60(concat_ws(" ", slice(col("t"), i + 1, lit(W))))))
      .otherwise(array().cast("array<long>"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"), explode(windows).as("span_hash"))
  }

  /** Spans appearing in ≥2 distinct documents: span hash, how many
    * docs contain it, total occurrences, and the smallest containing
    * doc id (the canonical place to look the text up). */
  def dedupSpans(spark: SparkSession, sfDir: String): DataFrame =
    spanHashes(spark, sfDir)
      .groupBy(col("span_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span_hash").asc)

  /** Per-document duplicated-window fraction — the curation signal
    * ("drop docs that are mostly verbatim repeats of the corpus").
    * A window counts as duplicated when its span hash occurs ≥2 times
    * GLOBALLY (cross-doc or within-doc — verbatim repetition either
    * way). Documents shorter than [[WindowTokens]] have no windows and
    * report rate 0. */
  def spanDupRate(spark: SparkSession, sfDir: String): DataFrame = {
    val wins = spanHashes(spark, sfDir)
    val counts = wins.groupBy(col("span_hash")).agg(count(lit(1)).as("n_occ"))
    val perDoc = wins.join(counts, "span_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("n_occ") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_rate",
        when(col("n_windows") > 0,
          col("n_dup_windows").cast("double") / col("n_windows"))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id").asc)
  }

  /** Shared oracle CTE: tokens → sliding W-token windows → 60-bit span
    * hashes, mirroring the Spark pipeline constant-for-constant. */
  private def spanSqlPrefix: String = {
    val W = WindowTokens
    val winList =
      s"""list_transform(range(0, greatest(len(t) - ${W - 1}, 0)),
         | i -> concat_ws(' ', ${(1 to W).map(j => s"t[i+$j]").mkString(", ")}))""".stripMargin.replace("\n", "")
    s"""toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
       |win AS (SELECT doc_id, unnest($winList) AS s FROM toks),
       |wh AS (SELECT doc_id, ${TextOps.hash60Sql("s")} AS span_hash FROM win)""".stripMargin
  }

  val dedupSpansSql: String =
    s"""WITH $spanSqlPrefix
       |SELECT span_hash,
       |       COUNT(DISTINCT doc_id) AS n_docs,
       |       COUNT(*) AS n_occ,
       |       MIN(doc_id) AS first_doc
       |FROM wh
       |GROUP BY span_hash
       |HAVING COUNT(DISTINCT doc_id) >= 2
       |ORDER BY n_docs DESC, n_occ DESC, span_hash ASC""".stripMargin

  val spanDupRateSql: String =
    s"""WITH $spanSqlPrefix,
       |cnt AS (SELECT span_hash, COUNT(*) AS n_occ FROM wh GROUP BY span_hash),
       |per_doc AS (SELECT w.doc_id,
       |                   COUNT(*) AS n_windows,
       |                   SUM(CASE WHEN c.n_occ >= 2 THEN 1 ELSE 0 END) AS n_dup_windows
       |            FROM wh w JOIN cnt c ON w.span_hash = c.span_hash
       |            GROUP BY w.doc_id)
       |SELECT d.doc_id,
       |       COALESCE(p.n_windows, 0) AS n_windows,
       |       COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
       |       CASE WHEN COALESCE(p.n_windows, 0) > 0
       |            THEN CAST(p.n_dup_windows AS DOUBLE) / p.n_windows
       |            ELSE 0.0 END AS dup_rate
       |FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id ASC""".stripMargin
}
