package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** One-call end-to-end curation: the library's operators composed into
  * the directory layout a training job reads, so "switching to graft"
  * is one function call rather than forty.
  *
  *   outDir/manifest/   — gated + downsampled corpus manifest
  *                        ([[Curation.corpusManifest]]), zstd parquet
  *   outDir/splits/     — leakage-safe train/val/test assignment
  *                        ([[ClusterOps.leakageSplit]]), zstd parquet
  *   outDir/sequences/  — fixed-token-budget packed sequences
  *                        ([[Packing.packSequences]]), zstd parquet
  *   outDir/shards/     — the manifest's documents with their shard /
  *                        position / split, gzip JSONL partitioned by
  *                        split ([[Sharding.shuffleExport]] ∩ manifest)
  *
  * Returns a summary frame (artifact, n_rows, path) — the receipt a
  * pipeline run logs. Counts ride the writes' own results where
  * possible; the heavy lifting (signature memos, cluster labels,
  * quality scores) is shared across stages through the session memos,
  * so the four artifacts cost little more than their union.
  *
  * Scale: each stage is an already-audited operator plan; the runner
  * adds only sinks. The JSONL shard export joins the export's slim
  * (doc_id, shard, pos, split) rows to the manifest's doc ids — an
  * 8-byte-key join — so undersampled documents never reach a shard
  * file.
  */
object Pipeline {

  def runCuration(spark: SparkSession, sfDir: String, outDir: String): DataFrame = {
    val manifest = Curation.corpusManifest(spark, sfDir)
    Tables.writeParquetZstd(manifest, s"$outDir/manifest")
    val splits = ClusterOps.leakageSplit(spark, sfDir)
    Tables.writeParquetZstd(splits, s"$outDir/splits")
    val sequences = Packing.packSequences(spark, sfDir)
    Tables.writeParquetZstd(sequences, s"$outDir/sequences")
    val shardRows = Sharding.shuffleExport(spark, sfDir)
      .join(spark.read.parquet(s"$outDir/manifest").select(col("doc_id")), "doc_id")
    shardRows.write.mode("overwrite")
      .partitionBy("split").option("compression", "gzip")
      .json(s"$outDir/shards")
    val counts = Seq(
      ("manifest", spark.read.parquet(s"$outDir/manifest").count(), s"$outDir/manifest"),
      ("splits", spark.read.parquet(s"$outDir/splits").count(), s"$outDir/splits"),
      ("sequences", spark.read.parquet(s"$outDir/sequences").count(), s"$outDir/sequences"),
      ("shards", spark.read.json(s"$outDir/shards").count(), s"$outDir/shards"))
    import spark.implicits._
    counts.toDF("artifact", "n_rows", "path").orderBy(col("artifact").asc)
  }
}
