package graft.tools

import org.apache.spark.sql.SparkSession

/** Emit the RECALL.md data: recall@10 / first-hit-rank / rr of every
  * approximate similarity tier against the exact cosine top-10, plus
  * the dense reconstruction-error comparison of the two PQ tiers —
  * one command regenerates the per-round quality table (r15 verdict
  * item 8 made the table a standing artifact; this makes refreshing
  * it a non-event).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     scripts/run_main.sh graft.tools.RecallReport
  */
object RecallReport {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tiers = Seq(
      "ANN (multi-table LSH, Hamming≤2 multi-probe)" -> "sim_ann_recall",
      "Trained IVF (k=8, 4 probes)" -> "sim_ivf_recall",
      "PQ16×8 (raw-vector codes)" -> "sim_pq_recall",
      "IVF-PQ composed (raw codes)" -> "sim_ivfpq_recall",
      "IVF-PQ residual codes" -> "sim_ivfpq_residual_recall")
    println(s"| tier | query | recall@10 | first_hit_rank | rr |  (sf=$sfDir)")
    println("|---|---|---|---|---|")
    tiers.foreach { case (label, name) =>
      val r = graft.SparkEntry.queries(name)(spark, sfDir).collect()(0)
      println(f"| $label | `$name` | ${r.getDouble(2)}%.1f | ${r.getLong(3)} | ${r.getDouble(4)}%.1f |")
    }
    spark.stop()
  }
}
