package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the patterns AQE's runtime skew-join
  * handling cannot cover (e.g. a broadcast-too-big dimension joined on a
  * heavily skewed key, or a deliberate pre-shuffle spread).
  *
  * Salted join: the fact side gets a DETERMINISTIC salt in [0, n) from a
  * hash of stable row-identifying columns (never `rand()` — results must
  * be reproducible across retries and engines); the dimension side is
  * replicated n times. The join key becomes (key, salt), spreading one
  * hot key over n shuffle partitions at the cost of n× the (small)
  * dimension side.
  */
object SkewOps {

  /** Deterministic salt in [0, n): hash of the given stable columns. */
  def salt(n: Int, saltCols: Column*): Column =
    pmod(xxhash64(saltCols: _*), lit(n.toLong)).cast("int")

  /** Equi-join `fact ⋈ dim` on `key`, salted `n` ways. Inner and
    * left-outer (fact-preserving) semantics are identical to the plain
    * join because every fact row finds exactly its own salt replica. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, n: Int,
                 saltCols: Seq[String], joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting preserves semantics only for fact-preserving joins, not $joinType")
    val salted = fact.withColumn("__salt", salt(n, saltCols.map(fact(_)): _*))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    val out = salted.join(replicated,
      salted(key) === replicated(key) && salted("__salt") === replicated("__salt"),
      joinType)
    out.drop(replicated(key)).drop("__salt")
  }
}
