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
  *   outDir/sequences/  — fixed-token-budget packed sequences over the
  *                        MANIFEST's documents only
  *                        ([[Packing.packSequences]]), zstd parquet
  *   outDir/shards/     — the manifest's documents with their shard /
  *                        position and the LEAKAGE-SAFE split, gzip
  *                        JSONL partitioned by split
  *
  * The shard layout deliberately takes its split from
  * [[ClusterOps.leakageSplit]], NOT [[Sharding.shuffleExport]]'s
  * per-document split: the whole point of writing a leakage-safe
  * assignment is that the directory a trainer reads uses it — two
  * artifacts in one output disagreeing on train/test would leak
  * near-duplicates across the eval line.
  *
  * Returns a summary frame (artifact, n_rows, path) — the receipt a
  * pipeline run logs. The heavy lifting (signature memos, cluster
  * labels, quality scores) is shared across stages through the session
  * memos, so the four artifacts cost little more than their union.
  *
  * Scale: each stage is an already-audited operator plan; the runner
  * adds only sinks. The JSONL shard export joins slim 8-byte-key rows
  * (shard/pos ⋈ manifest ids ⋈ cluster split), so undersampled
  * documents never reach a shard file, and the receipt counts read the
  * JSONL back with a PINNED schema (inference would decompress the
  * non-splittable gzip output twice).
  */
object Pipeline {

  def runCuration(spark: SparkSession, sfDir: String, outDir: String): DataFrame = {
    // write-path telemetry via observe(): the row count is collected BY
    // the write job itself (a CollectMetrics node on the sink plan), so
    // the receipt can cross-check what LEFT the pipeline against what
    // the directory reads back — catching a lossy sink or a concurrent
    // overwrite — without a second scan of anything
    val manifestObs = org.apache.spark.sql.Observation("manifest_write")
    val manifest = Curation.corpusManifest(spark, sfDir)
      .observe(manifestObs, count(lit(1)).as("rows_written"))
    Tables.writeParquetZstd(manifest, s"$outDir/manifest")
    val splits = ClusterOps.leakageSplit(spark, sfDir)
    Tables.writeParquetZstd(splits, s"$outDir/splits")
    // pack ONLY the manifest's documents: every artifact in the output
    // directory describes the same curated corpus (a trainer reading
    // sequences/ must not train on gated-out or non-canonical docs)
    val sequences = Packing.packSequences(spark, sfDir,
      onlyDocs = Some(spark.read.parquet(s"$outDir/manifest")))
    Tables.writeParquetZstd(sequences, s"$outDir/sequences")
    val shardRows = Sharding.shuffleExport(spark, sfDir)
      .drop("split")
      .join(spark.read.parquet(s"$outDir/manifest").select(col("doc_id")), "doc_id")
      .join(spark.read.parquet(s"$outDir/splits").select(col("doc_id"), col("split")), "doc_id")
    Tables.writeJsonl(shardRows, s"$outDir/shards", partitionCols = Seq("split"))
    val observed = manifestObs.get("rows_written").asInstanceOf[Long]
    val counts = Seq(
      ("manifest", spark.read.parquet(s"$outDir/manifest").count(), s"$outDir/manifest"),
      ("manifest_observed_at_write", observed, s"$outDir/manifest"),
      ("splits", spark.read.parquet(s"$outDir/splits").count(), s"$outDir/splits"),
      ("sequences", spark.read.parquet(s"$outDir/sequences").count(), s"$outDir/sequences"),
      ("shards", Tables.readJsonl(spark, s"$outDir/shards", shardRows.schema).count(),
        s"$outDir/shards"))
    import spark.implicits._
    counts.toDF("artifact", "n_rows", "path").orderBy(col("artifact").asc)
  }
}
