package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables

/** Deduplication operators over the `documents` table: exact dedup by
  * normalized-content hash, banded MinHash-LSH near-dedup, exact n-gram
  * Jaccard verification of LSH candidates, and SimHash signatures.
  *
  * Scale design — the load-bearing property at 100 TB:
  *  - Exact dedup is ONE hash aggregation on the 60-bit content hash
  *    (shuffle keys are 8-byte longs, not document text).
  *  - Near-dedup NEVER does an all-pairs crossJoin. MinHash signatures
  *    band into (band_id, band_key) buckets; only documents sharing a
  *    bucket are joined — the classic LSH candidate generation whose
  *    cost is Σ bucket² instead of n². Skewed buckets (boilerplate
  *    docs) are the known hot spot; AQE skew-join handles them at scale.
  *  - Jaccard verification joins only the candidate pairs (tiny) back
  *    to the shingle sets.
  *  - All signatures are integer arithmetic on md5-derived 60-bit
  *    hashes — deterministic across engines and partitionings, so every
  *    operator here has an exact DuckDB oracle.
  */
object DedupOps {

  val NumHashes = 12
  val NumBands = 4
  val RowsPerBand: Int = NumHashes / NumBands
  val ShingleK = 3
  val JaccardThreshold = 0.4

  /** Exact dedup: group by the 60-bit hash of normalized text, keep the
    * smallest doc_id as the canonical representative. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(TextOps.hash60(TextOps.normText(col("text"))).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_doc_id").asc)
  }

  val dedupExactSql: String = {
    val norm = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
    s"""SELECT ${TextOps.hash60Sql(norm)} AS content_hash,
       |       MIN(doc_id) AS keep_doc_id,
       |       COUNT(*) AS n_copies
       |FROM documents
       |GROUP BY content_hash
       |ORDER BY keep_doc_id ASC""".stripMargin
  }

  /** (doc_id, shingle-hash) pairs — the shared base of the MinHash ops. */
  private def shingleHashes(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col("text")), ShingleK)).as("s"))
      .select(col("doc_id"), TextOps.hash60(col("s")).as("h"))
  }

  /** MinHash signatures: per doc, the min of each of the NumHashes
    * permutations — one aggregation over the exploded shingle hashes. */
  private def signatures(spark: SparkSession, sfDir: String): DataFrame = {
    val mins = (0 until NumHashes).map(i => min(TextOps.permute(col("h"), i)).as(s"m$i"))
    shingleHashes(spark, sfDir).groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** Banded LSH candidate pairs: docs sharing at least one band bucket,
    * with the number of shared bands. The join key is (band_id,
    * band_key) — never a cross join. */
  def minhashCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    val bandStructs = (0 until NumBands).map { b =>
      struct(lit(b).as("band_id"),
        concat_ws("_", (0 until RowsPerBand).map(j => col(s"m${b * RowsPerBand + j}")): _*).as("band_key"))
    }
    val bands = signatures(spark, sfDir)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band_id").as("band_id"), col("bb.band_key").as("band_key"))
    bands.as("a").join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /** Shared SQL prefix: tokens → distinct shingles → hashes → signatures
    * → bands, mirroring the Spark pipeline constant-for-constant. */
  private def minhashSqlPrefix: String = {
    val shingleList =
      s"""list_distinct(list_transform(range(0, greatest(len(t) - ${ShingleK - 1}, 0)),
         | i -> concat_ws(' ', ${(1 to ShingleK).map(j => s"t[i+$j]").mkString(", ")})))""".stripMargin.replace("\n", "")
    val minExprs = (0 until NumHashes).map(i => s"MIN(${TextOps.permuteSql("h", i)}) AS m$i").mkString(",\n             ")
    val bandKeys = (0 until NumBands).map { b =>
      val parts = (0 until RowsPerBand).map(j => s"m${b * RowsPerBand + j}").mkString(", ")
      s"WHEN ${b} THEN concat_ws('_', $parts)"
    }.mkString(" ")
    s"""toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
       |sh AS (SELECT doc_id, unnest($shingleList) AS s FROM toks),
       |h AS (SELECT doc_id, ${TextOps.hash60Sql("s")} AS h FROM sh),
       |sig AS (SELECT doc_id,
       |             $minExprs
       |        FROM h GROUP BY doc_id),
       |bands AS (SELECT doc_id, b.range AS band_id,
       |                 CASE b.range $bandKeys END AS band_key
       |          FROM sig, range($NumBands) b)""".stripMargin
  }

  val minhashCandidatesSql: String =
    s"""WITH $minhashSqlPrefix
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
       |FROM bands a
       |JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |GROUP BY doc_a, doc_b
       |ORDER BY doc_a ASC, doc_b ASC""".stripMargin

  /** Exact n-gram Jaccard over the LSH candidate pairs only: |A∩B| via a
    * shingle-hash join restricted to candidates, |A|,|B| from per-doc
    * counts; jaccard = inter / (|A| + |B| - inter), thresholded. The
    * division is one IEEE op over exact integers — deterministic. */
  def nearDupJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val cand = minhashCandidates(spark, sfDir).select(col("doc_a"), col("doc_b"))
    val sh = shingleHashes(spark, sfDir)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.h") === col("sb.h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    val j = inter
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("n_inter")).cast("double")).as("jaccard"))
    j.where(col("jaccard") >= JaccardThreshold)
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  val nearDupJaccardSql: String =
    s"""WITH $minhashSqlPrefix,
       |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a
       |         JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |         GROUP BY 1, 2),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id),
       |inter AS (SELECT cand.doc_a, cand.doc_b, COUNT(*) AS n_inter
       |          FROM cand
       |          JOIN h sa ON cand.doc_a = sa.doc_id
       |          JOIN h sb ON cand.doc_b = sb.doc_id AND sa.h = sb.h
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |       CAST(n_inter AS DOUBLE) / CAST(ca.n + cb.n - n_inter AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN cnt ca ON doc_a = ca.doc_id
       |JOIN cnt cb ON doc_b = cb.doc_id
       |WHERE CAST(n_inter AS DOUBLE) / CAST(ca.n + cb.n - n_inter AS DOUBLE) >= $JaccardThreshold
       |ORDER BY doc_a ASC, doc_b ASC""".stripMargin

  val SimHashBits = 16

  /** SimHash: per token occurrence, each of the low SimHashBits of the
    * token hash votes ±1; the signature packs the signs of the per-bit
    * sums. Near-identical docs land within small Hamming distance. */
  def simhashSignatures(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tk"))
      .select(col("doc_id"), TextOps.hash60(col("tk")).as("h"))
    val bitSums = (0 until SimHashBits).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as(s"s$b")
    }
    val packed = (0 until SimHashBits).map { b =>
      when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
      .orderBy(col("doc_id").asc)
  }

  val simhashSignaturesSql: String = {
    val sums = (0 until SimHashBits)
      .map(b => s"SUM(((h >> $b) & 1) * 2 - 1) AS s$b").mkString(",\n             ")
    val packed = (0 until SimHashBits)
      .map(b => s"CASE WHEN s$b >= 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tk
       |             FROM documents),
       |h AS (SELECT doc_id, ${TextOps.hash60Sql("tk")} AS h FROM tok),
       |sig AS (SELECT doc_id,
       |             $sums
       |        FROM h GROUP BY doc_id)
       |SELECT doc_id, $packed AS simhash
       |FROM sig
       |ORDER BY doc_id ASC""".stripMargin
  }
}
