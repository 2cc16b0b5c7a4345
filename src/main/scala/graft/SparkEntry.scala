package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.RefQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extension surface) is registered here as a named query with a DuckDB
  * oracle SQL twin. Column names are aliased identically on both sides so
  * the driver's sort-columns-by-name hash compare is stable.
  */
object SparkEntry {

  /** Flagship query (Q1a shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.q1aTopRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1a_top_revenue"     -> ((s, dir) => RefQueries.q1aTopRevenue(s, dir)),
    "q1b_top_quantity"    -> ((s, dir) => RefQueries.q1bTopQuantity(s, dir)),
    "q1c_revenue_by_date" -> ((s, dir) => RefQueries.q1cRevenueByDate(s, dir)),
    "q2_supplier_join"    -> ((s, dir) => RefQueries.q2SupplierRevenueJoin(s, dir)),
    "eda_lineitem_stats"  -> ((s, dir) => RefQueries.edaLineitemStats(s, dir)),
    "agg_pricing_summary" -> ((s, dir) => RefQueries.aggPricingSummary(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1a_top_revenue"     -> RefQueries.q1aSql,
    "q1b_top_quantity"    -> RefQueries.q1bSql,
    "q1c_revenue_by_date" -> RefQueries.q1cSql,
    "q2_supplier_join"    -> RefQueries.q2Sql,
    "eda_lineitem_stats"  -> RefQueries.edaSql,
    "agg_pricing_summary" -> RefQueries.aggPricingSql
  )
}
