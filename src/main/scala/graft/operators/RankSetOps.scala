package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Ranking-window, multiset set-operation, and pivot surface — the
  * remaining ANSI shapes after [[AnalyticsExt]]'s rollup/cube/grouping
  * sets/EXCEPT/INTERSECT:
  *
  *  - rank / dense_rank / percent_rank / cume_dist with REAL peer
  *    semantics (the window orders by the measure alone, so ties are
  *    genuine peers — a tiebreak column would degrade every ranking
  *    function to row_number),
  *  - EXCEPT ALL / INTERSECT ALL (bag semantics: Catalyst plans both as
  *    a single count-compare aggregate + generate, never a join
  *    fan-out),
  *  - PIVOT with an explicit value list (each output column is a
  *    conditional aggregate inside ONE pass; an unlisted-values pivot
  *    would need a driver-side distinct first — the explicit list keeps
  *    the plan a plain two-phase HashAggregate).
  *
  * Determinism discipline: every ranked measure is exact integer cents
  * ([[RefQueries]]), so cross-engine peer groups are identical;
  * percent_rank/cume_dist are single IEEE divisions of small integers.
  */
object RankSetOps {

  /** Per-nation supplier revenue ranking with all four ANSI ranking
    * functions over one window. The window orders by the EXACT cent
    * revenue (ties = true peers, identical on both engines); the final
    * output order adds the supplier tiebreak. One exchange on
    * n_name partitions the window; supplier cardinality per nation is
    * bounded (dimension-sized), so window state never scales with the
    * fact table. */
  def supplierRankPct(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(Tables.supplier(spark, sfDir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(RefQueries.revenueCentsExact(col("l_extendedprice"), col("l_discount")).as("rc"))
    rankWindow(rev)
  }

  /** The window stage alone, over a (n_name, s_suppkey, rc) frame —
    * split out so the peer/tie semantics are testable on a frame with
    * KNOWN ties (the fixture's exact revenues rarely collide). */
  private[graft] def rankWindow(rev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("n_name")).orderBy(col("rc").desc)
    rev.select(col("n_name"), col("s_suppkey"),
        (col("rc").cast("double") / 10000.0).as("revenue"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
      .orderBy(col("n_name").asc, col("rnk").asc, col("s_suppkey").asc)
  }

  val supplierRankPctSql: String =
    s"""WITH rev AS (
       |  SELECT n_name, s_suppkey,
       |         ${RefQueries.revenueCentsExactSql("l_extendedprice", "l_discount")} AS rc
       |  FROM lineitem, supplier, nation
       |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  GROUP BY n_name, s_suppkey)
       |SELECT n_name, s_suppkey,
       |       CAST(rc AS DOUBLE) / 10000.0 AS revenue,
       |       CAST(rank() OVER w AS BIGINT) AS rnk,
       |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       |       percent_rank() OVER w AS pct_rank,
       |       cume_dist() OVER w AS cum_dist
       |FROM rev
       |WINDOW w AS (PARTITION BY n_name ORDER BY rc DESC)
       |ORDER BY n_name ASC, rnk ASC, s_suppkey ASC""".stripMargin

  val SetOpMonthA = ("1996-03-01", "1996-04-01")
  val SetOpMonthB = ("1997-03-01", "1997-04-01")

  private def monthShipments(spark: SparkSession, sfDir: String,
                             range: (String, String)): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(range._1).cast("timestamp") &&
             col("l_shipdate") < lit(range._2).cast("timestamp"))
      .select(col("l_suppkey"), col("l_returnflag"))

  /** EXCEPT ALL — bag difference of two month-slices of shipment
    * (supplier, flag) rows: a row survives max(0, countA − countB)
    * times. Catalyst plans this as one aggregate over the union with a
    * per-side count and a replicate-rows generate — the shuffle carries
    * one row PER DISTINCT KEY with two counts, not the multiset. */
  def exceptAllShipments(spark: SparkSession, sfDir: String): DataFrame =
    monthShipments(spark, sfDir, SetOpMonthA)
      .exceptAll(monthShipments(spark, sfDir, SetOpMonthB))
      .orderBy(col("l_suppkey").asc, col("l_returnflag").asc)

  val exceptAllShipmentsSql: String =
    s"""SELECT l_suppkey, l_returnflag FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '${SetOpMonthA._1}' AND l_shipdate < TIMESTAMP '${SetOpMonthA._2}'
       |EXCEPT ALL
       |SELECT l_suppkey, l_returnflag FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '${SetOpMonthB._1}' AND l_shipdate < TIMESTAMP '${SetOpMonthB._2}'
       |ORDER BY l_suppkey ASC, l_returnflag ASC""".stripMargin

  /** INTERSECT ALL — bag intersection (min of the two counts), same
    * count-compare plan shape as [[exceptAllShipments]]. */
  def intersectAllShipments(spark: SparkSession, sfDir: String): DataFrame =
    monthShipments(spark, sfDir, SetOpMonthA)
      .intersectAll(monthShipments(spark, sfDir, SetOpMonthB))
      .orderBy(col("l_suppkey").asc, col("l_returnflag").asc)

  val intersectAllShipmentsSql: String =
    s"""SELECT l_suppkey, l_returnflag FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '${SetOpMonthA._1}' AND l_shipdate < TIMESTAMP '${SetOpMonthA._2}'
       |INTERSECT ALL
       |SELECT l_suppkey, l_returnflag FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '${SetOpMonthB._1}' AND l_shipdate < TIMESTAMP '${SetOpMonthB._2}'
       |ORDER BY l_suppkey ASC, l_returnflag ASC""".stripMargin

  /** PIVOT — exact revenue by line status, one output column per return
    * flag. The explicit value list (A/N/R) makes this a single-pass
    * conditional aggregate; absent (status, flag) combinations are NULL
    * on both engines (no-ELSE CASE ≡ pivot's missing-cell null). */
  def pivotPricing(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")))
      .orderBy(col("l_linestatus").asc)

  val pivotPricingSql: String = {
    def arm(flag: String) =
      s"""CAST(SUM(CASE WHEN l_returnflag = '$flag'
         |         THEN ${RefQueries.revenueTermExactSql("l_extendedprice", "l_discount")}
         |         END) AS DOUBLE) / 10000.0 AS $flag""".stripMargin
    s"""SELECT l_linestatus,
       |       ${arm("A")},
       |       ${arm("N")},
       |       ${arm("R")}
       |FROM lineitem
       |GROUP BY l_linestatus
       |ORDER BY l_linestatus ASC""".stripMargin
  }
}
