package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Symmetric int8 embedding quantization — the storage/serving
  * compression step of an embedding pipeline: per vector, scale =
  * max|x| / 127 and q_i = round(x_i * 127 / max|x|) ∈ [-127, 127],
  * reported here as the scale plus order-sensitive integer checksums of
  * the quantized vector (sum, index-weighted sum, saturation count) so
  * the whole codebook is oracle-verifiable without shipping arrays
  * through the driver compare.
  *
  * Scale design: entirely map-side — array higher-order functions per
  * row, no shuffle except the output sort (a real pipeline writes the
  * quantized arrays straight back to parquet). Numeric determinism:
  * floats are widened to double once, every derived value is a single
  * IEEE op per element ((x * 127) / maxabs, then round-half-away-from-
  * zero, which Spark's HALF_UP and DuckDB's round() share), and the
  * checksums are integer sums — order-free, so partitioning cannot
  * perturb them. The all-zero vector (maxabs = 0) quantizes to zeros
  * with scale 0 rather than dividing by zero.
  */
object Quantization {

  def embedQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val e = col("embedding").cast("array<double>")
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), e.as("e"))
      .select(col("vec_id"), col("e"),
        array_max(transform(col("e"), x => abs(x))).as("maxabs"))
      .select(col("vec_id"),
        (col("maxabs") / 127).as("scale"),
        transform(col("e"), x =>
          when(col("maxabs") === 0, lit(0L))
            .otherwise(round(x * 127 / col("maxabs")).cast("long"))).as("q"))
      .select(col("vec_id"), col("scale"),
        coalesce(aggregate(col("q"), lit(0L), (acc, x) => acc + x), lit(0L)).as("q_sum"),
        coalesce(aggregate(transform(col("q"), (x, i) => x * (i + 1).cast("long")),
          lit(0L), (acc, x) => acc + x), lit(0L)).as("q_wsum"),
        size(filter(col("q"), x => abs(x) === 127)).cast("long").as("n_sat"))
      .orderBy(col("vec_id").asc)
  }

  val embedQuantizeSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |           FROM embeddings),
       |m AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS maxabs FROM e),
       |q AS (SELECT vec_id, maxabs / 127 AS scale,
       |             list_transform(e, x -> CASE WHEN maxabs = 0 THEN 0
       |                                         ELSE CAST(round(x * 127 / maxabs) AS BIGINT) END) AS q
       |      FROM m)
       |SELECT vec_id, scale,
       |       CAST(coalesce(list_sum(q), 0) AS BIGINT) AS q_sum,
       |       CAST(coalesce(list_sum(list_transform(q, (x, i) -> x * i)), 0) AS BIGINT) AS q_wsum,
       |       CAST(len(list_filter(q, x -> abs(x) = 127)) AS BIGINT) AS n_sat
       |FROM q
       |ORDER BY vec_id ASC""".stripMargin
}
