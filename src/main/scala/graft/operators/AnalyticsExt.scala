package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Analytic operators beyond the reference's surface that any user of a
  * warehouse engine reaches for quickly: rollup subtotals, set
  * operations, exact medians, calendar aggregation. All oracle-backed.
  *
  * Null-ordering note: Spark sorts nulls FIRST ascending by default,
  * DuckDB LAST — every ORDER BY over nullable keys pins NULLS FIRST on
  * both sides.
  */
object AnalyticsExt {

  /** ROLLUP subtotals over the pricing flags: per-(flag,status), per-flag
    * and grand-total rows in one pass (partial aggregation per grouping
    * set, one shuffle). */
  def rollupPricing(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val rollupPricingSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |       COUNT(*) AS n_rows,
       |       ${RefQueries.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Set operation: suppliers with 1996 shipments EXCEPT those with 1997
    * shipments (left-anti semantics via EXCEPT). */
  def exceptSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    def active(year: Int) = li
      .where(col("l_shipdate").between(lit(s"$year-01-01"), lit(s"$year-12-31 23:59:59")))
      .select(col("l_suppkey"))
    active(1996).except(active(1997)).orderBy(col("l_suppkey").asc)
  }

  val exceptSuppliersSql: String =
    """SELECT l_suppkey FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59'
      |EXCEPT
      |SELECT l_suppkey FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31 23:59:59'
      |ORDER BY l_suppkey ASC""".stripMargin

  /** Exact median quantity per return flag. Quantities are integral, so
    * the even-count midpoint average is exact (x.0 / x.5) and identical
    * across engines. */
  def medianQuantity(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .where(col("l_quantity").isNotNull)
      .groupBy(col("l_returnflag"))
      .agg(median(col("l_quantity")).as("median_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc)
  }

  val medianQuantitySql: String =
    """SELECT l_returnflag,
      |       median(l_quantity) AS median_qty,
      |       COUNT(*) AS n
      |FROM lineitem
      |WHERE l_quantity IS NOT NULL
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag ASC""".stripMargin

  /** Calendar aggregation: exact monthly revenue — date_trunc on both
    * engines, month boundaries identical in UTC. */
  def revenueByMonth(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate").isNotNull)
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("month").asc)
  }

  val revenueByMonthSql: String =
    s"""SELECT date_trunc('month', l_shipdate) AS month,
       |       ${RefQueries.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate IS NOT NULL
       |GROUP BY month
       |ORDER BY month ASC""".stripMargin
}
