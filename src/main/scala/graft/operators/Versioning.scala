package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables

/** Corpus snapshot diff — the manifest a pipeline emits between two
  * versions of a dataset: which documents were ADDED, REMOVED, CHANGED
  * (same id, different content), or UNCHANGED. Reruns, rollbacks, and
  * audit trails all start from this relation.
  *
  * Version simulation on the fixture (deterministic, so the oracle
  * replays it): v1 = docs with `doc_id % 10 != 0` (the pre-ingest
  * snapshot — the same delta convention as
  * [[DedupOps.incrementalCandidates]]); v2 = docs with
  * `doc_id % 7 != 0`, with text revised (suffix `" rev2"`) where
  * `doc_id % 5 == 0` — chosen so all four statuses occur. A real
  * deployment passes two actual snapshots to [[diffOf]].
  *
  * Scale design: each snapshot reduces to slim (doc_id, 120-bit
  * content hash) rows AT THE SCAN — text is dropped before anything
  * shuffles — and the diff is ONE full-outer equi-join on the 8-byte
  * doc_id with a per-row case expression. Two narrow projections and
  * one join is the minimal data movement a snapshot diff can have;
  * comparing 120-bit hashes instead of text makes a false "unchanged"
  * a birthday event past 2^60 documents, the same bound as exact
  * dedup.
  */
object Versioning {

  /** Diff two explicit snapshot frames (each with doc_id + text).
    *
    * `normalizeText = true` (the default) treats normalization-invariant
    * edits (case, punctuation, whitespace runs) as "unchanged" — the
    * content-identity notion exact dedup uses. Pass `false` when the
    * diff gates a downstream recompute whose inputs read the RAW text
    * (the incremental manifest's quality formula): there, a
    * case-or-punctuation-only revision MUST register as changed or the
    * stale verdict would be carried forward. */
  def diffOf(v1: DataFrame, v2: DataFrame, normalizeText: Boolean = true): DataFrame = {
    def slim(df: DataFrame, h1: String, h2: String) = {
      val key = if (normalizeText) TextOps.normText(col("text")) else col("text")
      val h = TextOps.hash120(key)
      df.select(col("doc_id"),
        h.getField("h1").as(h1), h.getField("h2").as(h2))
    }
    val status = when(col("old_hash").isNull, lit("added"))
      .when(col("new_hash").isNull, lit("removed"))
      .when(col("old_hash") === col("new_hash") &&
        col("o2") === col("n2"), lit("unchanged"))
      .otherwise(lit("changed"))
    slim(v1, "old_hash", "o2").join(slim(v2, "new_hash", "n2"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"), status.as("status"), col("old_hash"), col("new_hash"))
      .orderBy(col("doc_id").asc)
  }

  /** The simulated v1 snapshot (see class doc). Shared with the
    * incremental-manifest operator so the two cannot drift. */
  private[graft] def v1Of(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).where(col("doc_id") % 10 =!= 0)

  /** The simulated v2 snapshot: different membership, revised text on
    * doc_id % 5 == 0. */
  private[graft] def v2Of(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).where(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))

  /** v2's oracle twin as a CTE body (doc_id, source, lang, text). */
  private[graft] val v2Sql: String =
    """SELECT doc_id, source, lang,
      |       CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
      |FROM documents WHERE doc_id % 7 <> 0""".stripMargin

  def versionDiff(spark: SparkSession, sfDir: String): DataFrame =
    diffOf(v1Of(spark, sfDir), v2Of(spark, sfDir))

  val versionDiffSql: String = {
    def hashes(t: String) = {
      val norm = TextOps.normTextSql(t)
      (TextOps.hash60Sql(norm), TextOps.hash60bSql(norm))
    }
    val (a1, a2) = hashes("text")
    val (b1, b2) = hashes(
      "CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END")
    s"""WITH v1 AS (SELECT doc_id, $a1 AS old_hash, $a2 AS o2
       |            FROM documents WHERE doc_id % 10 <> 0),
       |v2 AS (SELECT doc_id, $b1 AS new_hash, $b2 AS n2
       |       FROM documents WHERE doc_id % 7 <> 0)
       |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       |       CASE WHEN old_hash IS NULL THEN 'added'
       |            WHEN new_hash IS NULL THEN 'removed'
       |            WHEN old_hash = new_hash AND o2 = n2 THEN 'unchanged'
       |            ELSE 'changed' END AS status,
       |       old_hash, new_hash
       |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
       |ORDER BY doc_id ASC""".stripMargin
  }
}
