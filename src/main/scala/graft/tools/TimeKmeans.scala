package graft.tools
import org.apache.spark.sql.SparkSession
/** Isolated k-means build timing at an arbitrary (sfDir, k) — the probe
  * used for the PLANS.md IVF build-cost adjudications. */
object TimeKmeans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val k = args(1).toInt
    val iters = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val cent = graft.operators.Similarity.kmeansCentroids(spark, sfDir, k, iters)
    val n = cent.count()
    println(f"TIME kmeans k=$k iters=$iters ${(System.nanoTime()-t0)/1e9}%.2f s ($n cells)")
    spark.stop()
  }
}
