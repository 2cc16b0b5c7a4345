package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.sources.Tables

/** Overlapping-window document chunking — the RAG / context-window
  * preparation step: split each document's token stream into windows of
  * `spark.graft.chunk.size` tokens starting every
  * `spark.graft.chunk.stride` tokens (so `size - stride` tokens overlap
  * between neighbors), keeping provenance (doc_id, chunk_id, start
  * offset) on every chunk.
  *
  * Scale design: a pure map-side operator — tokenize, explode the
  * start-offset sequence, slice. No shuffle at all until the output
  * sort (which a real pipeline writing chunks to parquet would drop);
  * chunk rows are produced streaming inside whole-stage codegen, so a
  * 10 MB document never materializes more than its own chunk list.
  * Fan-out is bounded: each token lands in at most
  * ceil(size / stride) chunks (2 at the 32/24 defaults).
  *
  * Differs from [[Packing]] (which concatenates across documents to
  * fill fixed sequences): chunking splits WITHIN a document and never
  * crosses document boundaries, so no window function and no
  * cross-document state are needed.
  */
object Chunking {

  /** The stateless core: applies to any frame with (doc_id, text) —
    * batch or streaming (projection + generator only, so Structured
    * Streaming runs it without state or watermark; chunk provenance is
    * per-document, never cross-row). */
  def chunkCols(docs: DataFrame): DataFrame = {
    val w = graft.GraftConf.chunkSize(docs.sparkSession)
    val s = graft.GraftConf.chunkStride(docs.sparkSession)
    // stride > size would silently drop the tokens between one chunk's
    // end and the next chunk's start from every document — fail fast
    // (stride == size is valid: disjoint chunks, zero overlap)
    require(s <= w,
      s"${graft.GraftConf.ChunkStrideKey}=$s must not exceed " +
        s"${graft.GraftConf.ChunkSizeKey}=$w (tokens would be dropped)")
    val t = col("t")
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .where(size(t) > 0)
      .select(col("doc_id"), t,
        posexplode(sequence(lit(0), size(t) - 1, lit(s))).as(Seq("chunk_id", "start_tok")))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(w), size(t) - col("start_tok")).cast("long").as("n_tok"),
        array_join(slice(t, col("start_tok") + 1, least(lit(w), size(t) - col("start_tok"))), " ")
          .as("chunk_text"))
  }

  def chunkDocuments(spark: SparkSession, sfDir: String): DataFrame =
    chunkCols(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id").asc, col("chunk_id").asc)

  val chunkDocumentsSql: String = {
    val w = graft.GraftConf.DefaultChunkSize
    val s = graft.GraftConf.DefaultChunkStride
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |              FROM documents),
       |starts AS (SELECT doc_id, t, unnest(range(0, len(t), $s)) AS start_tok
       |           FROM toks
       |           WHERE len(t) > 0)
       |SELECT doc_id,
       |       start_tok // $s AS chunk_id,
       |       start_tok,
       |       CAST(least($w, len(t) - start_tok) AS BIGINT) AS n_tok,
       |       array_to_string(t[start_tok + 1 : start_tok + least($w, len(t) - start_tok)], ' ') AS chunk_text
       |FROM starts
       |ORDER BY doc_id ASC, chunk_id ASC""".stripMargin
  }
}
