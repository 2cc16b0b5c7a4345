package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.BloomAgg
import graft.sources.Tables

/** Bloom-prefiltered fact⋈dimension join — the explicit runtime-filter
  * pattern for 100 TB joins: build a Bloom filter over the FILTERED
  * dimension keys (one aggregation → ONE broadcast row), probe it
  * per fact row at the scan (pure column arithmetic, codegen'd), and
  * only rows that might match reach the exact join. At scale this cuts
  * the fact side's join input by the dimension filter's selectivity
  * BEFORE any shuffle; false positives are removed by the exact join,
  * so the result is identical to the plain join — which is exactly
  * what the DuckDB oracle runs, making the no-false-negative property
  * oracle-verified rather than assumed.
  */
object BloomJoin {

  /** 8192 bits / 3 hashes: ~1% false-positive rate up to ~800 keys —
    * sized for the supplier dimension at fixture scale; a production
    * call sizes bits ≈ 10× expected keys. */
  val NumBits = 8192
  val NumHashes = 3
  val AcctbalMin = 5000.0

  /** Probe-side membership test: the SAME reduce-below-2^31-then-mix
    * positions the build side sets ([[BloomAgg.position]]), expressed
    * as Catalyst columns over the broadcast bit array. Every
    * intermediate stays under 2^63, so this is safe under Spark's
    * default ANSI mode for ANY long key (including 60-bit hash60
    * values) — a wrapping formulation would throw ARITHMETIC_OVERFLOW
    * at runtime on large keys. */
  def mightContain(bits: Column, key: Column): Column =
    (0 until NumHashes).map { i =>
      val k = pmod(key, lit(BloomAgg.KeyRange))
      val pos = pmod(k * lit(BloomAgg.MixA) + lit(i.toLong * BloomAgg.MixB), lit(NumBits.toLong))
      val word = element_at(bits, (shiftright(pos, 6) + lit(1L)).cast("int"))
      call_function("shiftright", word, pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** Lineitem volume per return flag, restricted to suppliers with
    * account balance above [[AcctbalMin]] — the fact side is
    * Bloom-prefiltered before the exact join. Supplier keys are unique,
    * so the inner join IS the semi join, and the oracle is the plain
    * two-table join with no bloom anywhere: any false negative in the
    * filter would drop rows and hash-mismatch. */
  def bloomSemiJoinVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val bloom = udaf(new BloomAgg(NumBits, NumHashes))
    val supp = Tables.supplier(spark, sfDir)
      .where(col("s_acctbal") > AcctbalMin)
      .select(col("s_suppkey"))
    val bloomRow = supp.agg(bloom(col("s_suppkey")).as("bits"))
    val fact = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_returnflag"), col("l_quantity"))
    fact.join(broadcast(bloomRow))
      .where(mightContain(col("bits"), col("l_suppkey")))
      .drop("bits")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc)
  }

  val bloomSemiJoinVolumeSql: String =
    s"""SELECT l.l_returnflag, COUNT(*) AS n_rows, SUM(l.l_quantity) AS sum_qty
       |FROM lineitem l
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |WHERE s.s_acctbal > $AcctbalMin
       |GROUP BY l.l_returnflag
       |ORDER BY l.l_returnflag ASC""".stripMargin
}
