package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-layout optimization — Z-order (Morton-curve) clustering, the
  * technique a 100 TB lake uses so that file-level min/max statistics
  * can skip data for predicates on MORE THAN ONE column. A linear sort
  * on `l_partkey` makes partkey ranges per file tight but leaves
  * `l_suppkey` spanning its whole domain in every file; interleaving
  * the bits of both keys onto one space-filling curve keeps BOTH
  * ranges narrow, at the cost of each being a little wider than a
  * dedicated sort.
  *
  * [[zorderLayout]] is the effectiveness READOUT of that layout — it
  * assigns every row to its Z-curve file bucket and reports the
  * per-bucket min/max of both keys (exactly the footer statistics a
  * scan planner would prune on) plus the row count. The whole pipeline
  * is integer arithmetic on broadcast min/max scalars — deterministic,
  * and replayed verbatim by the DuckDB oracle. The spec quantifies the
  * claim: the summed min/max span AREA of the Z-order buckets is far
  * below a partkey-sorted layout's (whose suppkey spans stay ~full
  * domain).
  *
  * Scale shape: one pass to compute the two (min, max) scalars
  * (broadcast), one map to compute bin/zval/bucket (codegen'd bit
  * arithmetic, no shuffle), one (bucket)-keyed aggregate — at 100 TB
  * the actual rewrite would `repartitionByRange(zval)` + write; the
  * bucket id here IS that range split, stated arithmetically so the
  * oracle can verify it. */
object LayoutOps {

  /** Bits per dimension (8 ⇒ 256×256 Z-cells, 16-bit zval). */
  val ZBits = 8

  /** File buckets the curve is cut into (64 ⇒ zval div 1024). */
  val ZFiles = 64

  /** Morton interleave of the two [[ZBits]]-bit bins as a Σ of
    * `div`/`%` terms — ALL-INTEGER (a float division here could round
    * a bin boundary at corpus-scale key magnitudes), and textually the
    * same arithmetic the oracle replays. x rides the even bit
    * positions, y the odd. */
  private[graft] val mortonExpr: String =
    (0 until ZBits).map { i =>
      s"((xb div ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"((yb div ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** (l_partkey, l_suppkey, zval): every lineitem row on the Morton
    * curve — the shared projection under both the [[zorderLayout]]
    * readout and the [[zorderWrite]] sink. */
  private def zvalFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"))
    val stats = li.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    li.crossJoin(broadcast(stats))
      .selectExpr("l_partkey", "l_suppkey",
        s"((l_partkey - pmin) * ${1 << ZBits}) div (pmax - pmin + 1) AS xb",
        s"((l_suppkey - smin) * ${1 << ZBits}) div (smax - smin + 1) AS yb")
      .selectExpr("l_partkey", "l_suppkey", s"($mortonExpr) AS zval")
  }

  /** MATERIALIZE the Z-order layout: range-partition the rows by zval
    * into [[ZFiles]] output files (each file a contiguous curve range,
    * sorted within so row-group statistics are tight) and write
    * parquet. This is exactly "the rewrite at 100 TB": the same
    * repartitionByRange + write, only the file count scales. The
    * comparison baseline a lake would migrate FROM is
    * [[singleKeyWrite]]. */
  def zorderWrite(spark: SparkSession, sfDir: String, outDir: String,
                  files: Int = ZFiles): Unit =
    zvalFrame(spark, sfDir)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(outDir)

  /** The single-key-sorted baseline layout: same file count, range
    * partitioned + sorted on `l_partkey` alone — partkey ranges per
    * file are as tight as possible, suppkey spans ~the whole domain in
    * every file. */
  def singleKeyWrite(spark: SparkSession, sfDir: String, outDir: String,
                     files: Int = ZFiles): Unit =
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"))
      .repartitionByRange(files, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(outDir)

  /** What a statistics-pruning scan must READ from `dir` to answer a
    * two-sided box predicate `l_partkey ∈ [pMin,pMax] ∧ l_suppkey ∈
    * [sMin,sMax]`: walks every parquet footer and keeps each row group
    * whose (min,max) ranges intersect the box on BOTH columns — the
    * identical file/row-group-level skipping a parquet reader performs
    * from those same footer statistics. Driver-side footer walk over a
    * file LISTING (bounded by file count, never data). */
  def scanEstimate(spark: SparkSession, dir: String,
                   pMin: Long, pMax: Long, sMin: Long, sMax: Long): ScanEstimate = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    var filesToRead, rowGroups, rowGroupsToRead = 0
    var rows, rowsToRead = 0L
    files.foreach { p =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        var touched = false
        rd.getFooter.getBlocks.asScala.foreach { b =>
          rowGroups += 1
          rows += b.getRowCount
          def range(name: String): (Long, Long) = {
            val st = b.getColumns.asScala
              .find(_.getPath.toDotString == name).get.getStatistics
            (st.genericGetMin.asInstanceOf[Number].longValue(),
              st.genericGetMax.asInstanceOf[Number].longValue())
          }
          val (pmn, pmx) = range("l_partkey")
          val (smn, smx) = range("l_suppkey")
          if (pmx >= pMin && pmn <= pMax && smx >= sMin && smn <= sMax) {
            rowGroupsToRead += 1
            rowsToRead += b.getRowCount
            touched = true
          }
        }
        if (touched) filesToRead += 1
      } finally rd.close()
    }
    ScanEstimate(files.length, filesToRead, rowGroups, rowGroupsToRead, rows, rowsToRead)
  }

  /** Footer-statistics scan audit for one layout directory and one box
    * predicate: of `files`/`rowGroups`/`rows` present, a pruning reader
    * must touch `filesToRead`/`rowGroupsToRead`/`rowsToRead`. */
  final case class ScanEstimate(files: Int, filesToRead: Int,
                                rowGroups: Int, rowGroupsToRead: Int,
                                rows: Long, rowsToRead: Long)

  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = 1L << (2 * ZBits)
    zvalFrame(spark, sfDir)
      .selectExpr("l_partkey", "l_suppkey",
        s"zval div ${cells / ZFiles} AS bucket")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
        min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
      .orderBy(col("bucket").asc)
  }

  /** The oracle replays the identical integer arithmetic — bins from
    * the same min/max scalars, the interleave as a Σ of
    * division/modulo terms, the same bucket cut. */
  val zorderLayoutSql: String = {
    val terms = (0 until ZBits).map { i =>
      s"((xb // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"((yb // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    val cells = 1L << (2 * ZBits)
    s"""WITH stats AS (SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
       |                      MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
       |               FROM lineitem),
       |binned AS (SELECT l_partkey, l_suppkey,
       |                  ((l_partkey - pmin) * ${1 << ZBits}) // (pmax - pmin + 1) AS xb,
       |                  ((l_suppkey - smin) * ${1 << ZBits}) // (smax - smin + 1) AS yb
       |           FROM lineitem, stats),
       |zed AS (SELECT l_partkey, l_suppkey, ($terms) AS zval FROM binned)
       |SELECT zval // ${cells / ZFiles} AS bucket,
       |       COUNT(*) AS n_rows,
       |       MIN(l_partkey) AS p_min, MAX(l_partkey) AS p_max,
       |       MIN(l_suppkey) AS s_min, MAX(l_suppkey) AS s_max
       |FROM zed
       |GROUP BY 1
       |ORDER BY bucket ASC""".stripMargin
  }
}
