package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TimeDocs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    println("parts=" + docs.rdd.getNumPartitions)
    // shingle+hash pass, the text family's map-heavy core
    def shingleWork(df: org.apache.spark.sql.DataFrame) = {
      import graft.functions.TextOps
      df.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
        .select(col("doc_id"), explode(TextOps.ngramIndex(col("t"), 8)).as("i"), col("t"))
        .select(TextOps.hash60(TextOps.ngramAt(col("t"), col("i"), 8)).as("h"))
        .agg(sum(col("h"))).collect()
    }
    t("shingle 1-part warm")(shingleWork(docs))
    t("shingle 1-part")(shingleWork(docs))
    val re = docs.repartition(32)
    t("shingle 32-part warm")(shingleWork(re))
    t("shingle 32-part")(shingleWork(re))
    spark.stop()
  }
}
