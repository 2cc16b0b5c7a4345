package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables

/** Eval-set decontamination — the overlap check every training
  * pipeline runs before release: find corpus documents sharing enough
  * rare word-shingles with a held-out evaluation set that they would
  * leak benchmark content into training. Here the held-out set is the
  * [[EvalSource]] slice of the documents table; output is every
  * (corpus doc, eval doc) pair sharing at least [[MinShared]] rare
  * shingles, with the count as evidence.
  *
  * Scale design: the join key is the 60-bit shingle hash, and shingles
  * occurring in more than [[MaxShingleDf]] documents are dropped FIRST
  * — common phrases carry no contamination signal but dominate the
  * join fan-out (the same hot-key discipline as the LSH bucket caps:
  * the frequency window shuffles on the same key the eval⋈corpus join
  * uses, so the exchange is reused, and per-key join work is bounded
  * by MaxShingleDf × eval-side occupancy). Per-doc shingles are
  * distinct (set semantics), so the shared count is exact |A∩B| over
  * rare shingles. */
object Decontamination {

  val EvalSource = "src0"
  val ShingleK = 3
  /** Shingles in more documents than this are too common to signal
    * contamination — and are exactly the hot join keys. */
  val MaxShingleDf = 10
  val MinShared = 3

  def evalOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        explode(TextOps.shingles(TextOps.tokens(col("text")), ShingleK)).as("s"))
      .select(col("doc_id"), col("source"), TextOps.hash60(col("s")).as("h"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .where(col("df") <= MaxShingleDf)
    val eval = sh.where(col("source") === EvalSource)
      .select(col("doc_id").as("eval_doc"), col("h"))
    val corpus = sh.where(col("source") =!= EvalSource)
      .select(col("doc_id").as("corpus_doc"), col("h"))
    corpus.join(eval, "h")
      .groupBy(col("corpus_doc"), col("eval_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= MinShared)
      .orderBy(col("corpus_doc").asc, col("eval_doc").asc)
  }

  val evalOverlapSql: String = {
    val shingleList =
      s"""list_distinct(list_transform(range(0, greatest(len(t) - ${ShingleK - 1}, 0)),
         | i -> concat_ws(' ', ${(1 to ShingleK).map(j => s"t[i+$j]").mkString(", ")})))""".stripMargin.replace("\n", "")
    s"""WITH toks AS (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |              FROM documents),
       |sh AS (SELECT doc_id, source, unnest($shingleList) AS s FROM toks),
       |h AS (SELECT doc_id, source, ${TextOps.hash60Sql("s")} AS h FROM sh),
       |f AS (SELECT doc_id, source, h FROM h
       |      QUALIFY COUNT(*) OVER (PARTITION BY h) <= $MaxShingleDf),
       |e AS (SELECT doc_id AS eval_doc, h FROM f WHERE source = '$EvalSource'),
       |c AS (SELECT doc_id AS corpus_doc, h FROM f WHERE source <> '$EvalSource')
       |SELECT c.corpus_doc, e.eval_doc, COUNT(*) AS n_shared
       |FROM c JOIN e ON c.h = e.h
       |GROUP BY c.corpus_doc, e.eval_doc
       |HAVING COUNT(*) >= $MinShared
       |ORDER BY corpus_doc ASC, eval_doc ASC""".stripMargin
  }
}
