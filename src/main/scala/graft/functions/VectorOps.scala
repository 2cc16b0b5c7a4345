package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * Spark's higher-order functions (`zip_with` / `aggregate` / `transform`)
  * rather than UDFs, so the expressions stay inside Catalyst (prunable,
  * null-safe, serialization-free).
  *
  * All arithmetic is promoted to double and folded left-to-right in index
  * order — the same sequential evaluation the DuckDB oracle's
  * `list_sum(list_transform(...))` performs — so results agree to within
  * 1 ulp across engines (exactly, in practice).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ (IEEE sqrt is correctly rounded, so cross-engine identical). */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(null).cast("double")).otherwise(d / n)
  }

  /** Sign bit of a deterministic random-hyperplane projection: the p-th
    * hyperplane's i-th component is ±1 chosen by the parity of
    * xxhash64(p, i). ±1 hyperplanes keep the projection an exact integer
    * sum of float-to-double casts — deterministic across partitionings. */
  def hyperplaneSignBit(vec: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
        when(pmod(xxhash64(lit(plane), i), lit(2)) === 0, x.cast("double"))
          .otherwise(-x.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0.0, 1L).otherwise(0L)
  }

  /** LSH bucket id for one hash table: `nBits` hyperplane sign bits packed
    * into a long. Vectors in the same bucket are near-duplicate / ANN
    * candidates — the scale path that avoids an all-pairs crossJoin. */
  def signBucket(vec: Column, table: Int, nBits: Int): Column =
    (0 until nBits).map { b =>
      hyperplaneSignBit(vec, table * 1000 + b) * (1L << b)
    }.reduce(_ + _)
}
