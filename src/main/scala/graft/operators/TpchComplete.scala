package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.sources.Tables

/** The eight TPC-H-shaped analogs that complete the 22-query sweep
  * (q8/q9/q11/q13/q15/q17/q20/q21; the rest live in [[RefQueries]],
  * [[AnalyticsExt]], and [[TpchExt]]) — each picked for a join/subquery
  * shape the suite didn't cover yet:
  *
  *  - q8: a ratio of conditional exact-decimal sums over a two-branch
  *    dimension snowflake (customer→nation→region on one side,
  *    supplier→nation on the other, both branches broadcast).
  *  - q9: a computed measure spanning both join sides (revenue minus a
  *    cost term; `p_retailprice` stands in for the absent
  *    `ps_supplycost`), all-integer until one final division.
  *  - q11: HAVING against a broadcast global scalar — the group value
  *    vs corpus-total comparison runs on exact decimals, never a float.
  *  - q13: LEFT OUTER with the filter INSIDE the join condition (the
  *    outer-join-correctness trap: a WHERE would silently turn it
  *    inner), then a two-level aggregate distribution.
  *  - q15: equality against a broadcast MAX over an aggregated
  *    subquery, compared on exact decimals so revenue ties survive.
  *  - q17: the per-group-average correlated predicate, integer-rewritten
  *    (5·qty·n < Σqty ⟺ qty < 0.2·avg) so no float mean ever crosses
  *    engines; the DataFrame side is the decorrelated window form.
  *  - q20: a two-level semi-join chain (supplier ← qualifying
  *    (supplier, part) aggregate ← name-prefixed parts) with HAVING.
  *  - q21: EXISTS + NOT EXISTS self-joins on the fact table — one
  *    shuffle key (`l_orderkey`) serves the semi AND the anti probe.
  *
  * Fixture adaptations (FIXTURES.md §C): no partsupp → lineitem is the
  * part↔supplier map and `p_retailprice` the cost analog; no
  * commit/receipt dates → `l_returnflag = 'R'` marks a "late/failed"
  * line (the [[TpchExt]] q4 precedent); no containers/ship modes →
  * `p_type` plays the container role. The operator shapes — which is
  * what the reference's query inventory actually exercises — are
  * faithful.
  *
  * Money follows the [[RefQueries]] exact fixed-point discipline:
  * integer 10⁻⁴-dollar units summed as DECIMAL(38,0), one IEEE division
  * at the very end, so every aggregate is partition-order independent
  * and bit-identical to the DuckDB oracle.
  */
object TpchComplete {

  import RefQueries.{cents, revenueTermExact, revenueTermExactSql}

  private val zeroE4 = lit(0).cast(DecimalType(38, 0))

  // ---------------------------------------------------------------- q8

  val Q8Region = "ASIA"
  val Q8Nation = "NATION_10"
  val Q8Type = "STANDARD"
  val Q8Start = "1995-01-01"
  val Q8End = "1997-01-01"

  /** TPC-H Q8 analog — national market share: the fraction of revenue
    * on [[Q8Type]] parts sold to [[Q8Region]] customers that was
    * supplied from [[Q8Nation]], per order year. Both dimension
    * branches (customer→nation→region, supplier→nation) broadcast; the
    * fact table shuffles once per big join (lineitem⋈orders on the
    * order key). Numerator and denominator accumulate in ONE aggregate
    * as exact decimals; the share is a single IEEE division. */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val term = revenueTermExact(col("l_extendedprice"), col("l_discount"))
    val custNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).where(col("r_name") === Q8Region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cust_nationkey"))
    val suppNations = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("supp_nationkey"),
        col("n_name").as("supp_nation"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(Tables.part(spark, sfDir)
          .where(col("p_type") === Q8Type).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir)
          .where(col("o_orderdate") >= lit(Q8Start).cast("timestamp") &&
                 col("o_orderdate") < lit(Q8End).cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast(LongType).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNations),
        col("c_nationkey") === col("cust_nationkey"))
      .join(broadcast(Tables.supplier(spark, sfDir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNations),
        col("s_nationkey") === col("supp_nationkey"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === Q8Nation, term).otherwise(zeroE4))
             .as("num"),
           sum(term).as("den"))
      .select(col("o_year"),
        (col("num").cast("double") / col("den").cast("double")).as("mkt_share"))
      .orderBy(col("o_year").asc)
  }

  val q8MarketShareSql: String =
    s"""SELECT o_year, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       |         SUM(CASE WHEN n2.n_name = '$Q8Nation'
       |             THEN ${revenueTermExactSql("l_extendedprice", "l_discount")}
       |             ELSE CAST(0 AS DECIMAL(38,0)) END) AS num,
       |         SUM(${revenueTermExactSql("l_extendedprice", "l_discount")}) AS den
       |  FROM lineitem, orders, customer, supplier, part, nation n1, region, nation n2
       |  WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
       |    AND o_custkey = c_custkey AND l_suppkey = s_suppkey
       |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
       |    AND r_name = '$Q8Region' AND s_nationkey = n2.n_nationkey
       |    AND p_type = '$Q8Type'
       |    AND o_orderdate >= TIMESTAMP '$Q8Start'
       |    AND o_orderdate < TIMESTAMP '$Q8End'
       |  GROUP BY 1) shares
       |ORDER BY o_year ASC""".stripMargin

  // ---------------------------------------------------------------- q9

  val Q9NameSubstring = "gear"

  /** TPC-H Q9 analog — product-type profit: per supplier nation and
    * order year, Σ (revenue − cost) over parts whose name contains
    * [[Q9NameSubstring]], with `p_retailprice·quantity` as the cost
    * analog. Profit stays an exact integer in 10⁻⁴-dollar units
    * (revenue term minus cost-cents·100) through the aggregate. */
  def q9ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val profit = (revenueTermExact(col("l_extendedprice"), col("l_discount")) -
      (cents(col("p_retailprice")) * col("l_quantity").cast(LongType) * lit(100L))
        .cast(DecimalType(38, 0))).as("profit_e4")
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(Tables.part(spark, sfDir)
          .where(col("p_name").contains(Q9NameSubstring))
          .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, sfDir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)
          .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast(LongType).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg((sum(profit).cast("double") / 10000.0).as("sum_profit"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  val q9ProductProfitSql: String =
    s"""SELECT nation, o_year,
       |       CAST(SUM(profit_e4) AS DOUBLE) / 10000.0 AS sum_profit
       |FROM (
       |  SELECT n_name AS nation,
       |         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       |         ${revenueTermExactSql("l_extendedprice", "l_discount")}
       |         - CAST(CAST(ROUND(p_retailprice * 100) AS BIGINT)
       |                * CAST(l_quantity AS BIGINT) * 100 AS DECIMAL(38,0))
       |           AS profit_e4
       |  FROM lineitem, part, supplier, nation, orders
       |  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
       |    AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
       |    AND p_name LIKE '%$Q9NameSubstring%') profit
       |GROUP BY nation, o_year
       |ORDER BY nation ASC, o_year DESC""".stripMargin

  // --------------------------------------------------------------- q11

  val Q11Nation = "NATION_3"
  val Q11FracInv = 1000L

  /** TPC-H Q11 analog — important parts: parts whose revenue through
    * [[Q11Nation]] suppliers exceeds 1/[[Q11FracInv]] of that nation's
    * total. The global total is a 1-row broadcast; the threshold
    * comparison multiplies the EXACT decimal by the integer fraction
    * inverse instead of dividing the total — no float boundary. */
  def q11ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val nationSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
          .where(col("n_name") === Q11Nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(spark, sfDir)
      .join(broadcast(nationSupp), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(revenueTermExact(col("l_extendedprice"), col("l_discount")))
        .as("value_e4"))
    val total = perPart.agg(sum(col("value_e4")).as("total_e4"))
    perPart.crossJoin(broadcast(total))
      .where(col("value_e4") * lit(Q11FracInv) > col("total_e4"))
      .select(col("l_partkey"),
        (col("value_e4").cast("double") / 10000.0).as("value"))
      .orderBy(col("value").desc, col("l_partkey").asc)
  }

  /** The twin compares on BIGINT (exact up to 9.2·10¹⁸ 10⁻⁴-dollar
    * units per part — far past any realistic per-part revenue; neither
    * engine has a shared exact wider type: Spark lacks HUGEINT, DuckDB
    * refuses DECIMAL(38,0) multiplication). The DataFrame side keeps
    * the full DECIMAL(38,0) comparison. */
  val q11ImportantPartsSql: String =
    s"""WITH per_part AS (
       |  SELECT l_partkey,
       |         SUM(${revenueTermExactSql("l_extendedprice", "l_discount")}) AS value_e4
       |  FROM lineitem
       |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier, nation
       |                      WHERE s_nationkey = n_nationkey
       |                        AND n_name = '$Q11Nation')
       |  GROUP BY l_partkey)
       |SELECT l_partkey, CAST(value_e4 AS DOUBLE) / 10000.0 AS value
       |FROM per_part
       |WHERE CAST(value_e4 AS BIGINT) * $Q11FracInv
       |      > (SELECT CAST(SUM(value_e4) AS BIGINT) FROM per_part)
       |ORDER BY value DESC, l_partkey ASC""".stripMargin

  // --------------------------------------------------------------- q13

  val Q13ExcludePriority = "1-URGENT"

  /** TPC-H Q13 analog — customer order-count distribution: how many
    * customers placed 0, 1, 2, … non-urgent orders. The order filter
    * lives INSIDE the left-outer join condition — in a WHERE it would
    * silently discard the zero-order customers the query exists to
    * count. Two aggregates: per-customer counts (shuffle on the
    * customer key the join already established), then the tiny
    * distribution. */
  def q13OrderDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ords = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") =!= Q13ExcludePriority)
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(spark, sfDir).select(col("c_custkey"))
      .join(ords, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13OrderDistributionSql: String =
    s"""SELECT c_count, COUNT(*) AS custdist
       |FROM (
       |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
       |  FROM customer LEFT OUTER JOIN orders
       |    ON c_custkey = o_custkey
       |   AND o_orderpriority <> '$Q13ExcludePriority'
       |  GROUP BY c_custkey) c_orders
       |GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --------------------------------------------------------------- q15

  val Q15Start = "1996-01-01"
  val Q15End = "1996-04-01"

  /** TPC-H Q15 analog — top supplier(s) of a quarter: suppliers whose
    * quarterly revenue EQUALS the maximum. The max is a 1-row broadcast
    * and the equality compares exact decimals (a float-revenue equality
    * would drop legitimate ties); the supplier join probes with the
    * (usually single-row) winners, so supplier never broadcasts the
    * fact side. */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(Q15Start).cast("timestamp") &&
             col("l_shipdate") < lit(Q15End).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenueTermExact(col("l_extendedprice"), col("l_discount")))
        .as("rev_e4"))
    val top = rev.crossJoin(broadcast(rev.agg(max(col("rev_e4")).as("max_e4"))))
      .where(col("rev_e4") === col("max_e4"))
    Tables.supplier(spark, sfDir).select(col("s_suppkey"), col("s_name"))
      .join(broadcast(top), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_e4").cast("double") / 10000.0).as("total_revenue"))
      .orderBy(col("s_suppkey").asc)
  }

  val q15TopSupplierSql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey,
       |         SUM(${revenueTermExactSql("l_extendedprice", "l_discount")}) AS rev_e4
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$Q15Start'
       |    AND l_shipdate < TIMESTAMP '$Q15End'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(rev_e4 AS DOUBLE) / 10000.0 AS total_revenue
       |FROM supplier, revenue
       |WHERE s_suppkey = l_suppkey
       |  AND rev_e4 = (SELECT MAX(rev_e4) FROM revenue)
       |ORDER BY s_suppkey ASC""".stripMargin

  // --------------------------------------------------------------- q17

  val Q17Type = "SMALL"

  /** TPC-H Q17 analog — small-quantity-order revenue: weekly-ized
    * revenue on [[Q17Type]]-part lines whose quantity is below 20% of
    * that part's average. The correlated per-part average is rewritten
    * all-integer (5·qty·n < Σqty) and expressed as TWO window
    * aggregates over one part-keyed exchange — the decorrelated plan
    * the optimizers produce for the SQL twin's correlated subqueries,
    * stated directly. One IEEE division at the very end. */
  def q17SmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity").cast(LongType).as("qty"),
        col("l_extendedprice"))
      .join(broadcast(Tables.part(spark, sfDir)
          .where(col("p_type") === Q17Type).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("qty"), col("l_extendedprice"),
        count(lit(1)).over(w).as("n"), sum(col("qty")).over(w).as("sum_qty"))
      .where(lit(5L) * col("qty") * col("n") < col("sum_qty"))
      .agg((sum(cents(col("l_extendedprice"))).cast("double") / 700.0)
        .as("avg_yearly"))
  }

  val q17SmallQtyRevenueSql: String =
    s"""SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
       |       / 700.0 AS avg_yearly
       |FROM lineitem l, part
       |WHERE p_partkey = l.l_partkey
       |  AND p_type = '$Q17Type'
       |  AND 5 * CAST(l.l_quantity AS BIGINT)
       |      * (SELECT COUNT(*) FROM lineitem l2
       |         WHERE l2.l_partkey = l.l_partkey)
       |      < (SELECT CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
       |         FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  // --------------------------------------------------------------- q20

  val Q20Prefix = "red"
  val Q20Year = 1996
  val Q20MinQty = 40L

  /** TPC-H Q20 analog — promotion-candidate suppliers: suppliers who
    * shipped more than [[Q20MinQty]] units of some [[Q20Prefix]]-named
    * part during [[Q20Year]] (a shipped-volume floor standing in for
    * the absent availqty stock rule). Two chained semi joins: the
    * name-prefixed part keys (broadcast) gate the lineitem scan, the
    * qualifying supplier keys gate the supplier scan — nothing but keys
    * and one (supplier, part)-grained aggregate ever shuffles. */
  def q20PromotionSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val redParts = Tables.part(spark, sfDir)
      .where(col("p_name").startsWith(Q20Prefix)).select(col("p_partkey"))
    val qualifying = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(s"$Q20Year-01-01").cast("timestamp") &&
             col("l_shipdate") < lit(s"${Q20Year + 1}-01-01").cast("timestamp"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast(LongType)).as("sq"))
      .where(col("sq") > Q20MinQty)
      .select(col("l_suppkey"))
    Tables.supplier(spark, sfDir).select(col("s_suppkey"), col("s_name"))
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .orderBy(col("s_suppkey").asc)
  }

  val q20PromotionSuppliersSql: String =
    s"""SELECT s_suppkey, s_name
       |FROM supplier
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part
       |                      WHERE p_name LIKE '$Q20Prefix%')
       |    AND l_shipdate >= TIMESTAMP '$Q20Year-01-01'
       |    AND l_shipdate < TIMESTAMP '${Q20Year + 1}-01-01'
       |  GROUP BY l_suppkey, l_partkey
       |  HAVING SUM(CAST(l_quantity AS BIGINT)) > $Q20MinQty)
       |ORDER BY s_suppkey ASC""".stripMargin

  // --------------------------------------------------------------- q21

  val Q21Nation = "NATION_7"

  /** TPC-H Q21 analog — suppliers who kept orders waiting: for
    * [[Q21Nation]] suppliers, count their returned lines in finished
    * multi-supplier orders where they were the ONLY supplier with a
    * return (`l_returnflag = 'R'` marks the "late" line, the q4
    * precedent). The EXISTS is a LEFT SEMI and the NOT EXISTS a LEFT
    * ANTI self-join — both probe on the SAME `l_orderkey` shuffle key,
    * and the nation filter (broadcast) prunes the probe side before
    * either self-join runs. */
  def q21WaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val k = graft.GraftConf.topK(spark)
    val nationSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
          .where(col("n_name") === Q21Nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val l1 = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("l1_orderkey"),
        col("l_suppkey").as("l1_suppkey"))
    val l2 = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
    val l3 = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"))
    l1.join(broadcast(nationSupp), col("l1_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir)
          .where(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l1_orderkey") === col("o_orderkey"), "left_semi")
      .join(l2, col("l2_orderkey") === col("l1_orderkey") &&
        col("l2_suppkey") =!= col("l1_suppkey"), "left_semi")
      .join(l3, col("l3_orderkey") === col("l1_orderkey") &&
        col("l3_suppkey") =!= col("l1_suppkey"), "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(k)
  }

  def q21WaitingSuppliersSql(k: Int = graft.GraftConf.DefaultTopK): String =
    s"""SELECT s_name, COUNT(*) AS numwait
       |FROM supplier, lineitem l1, orders, nation
       |WHERE s_suppkey = l1.l_suppkey
       |  AND o_orderkey = l1.l_orderkey
       |  AND o_orderstatus = 'F'
       |  AND l1.l_returnflag = 'R'
       |  AND s_nationkey = n_nationkey
       |  AND n_name = '$Q21Nation'
       |  AND EXISTS (SELECT 1 FROM lineitem l2
       |              WHERE l2.l_orderkey = l1.l_orderkey
       |                AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
       |                  WHERE l3.l_orderkey = l1.l_orderkey
       |                    AND l3.l_suppkey <> l1.l_suppkey
       |                    AND l3.l_returnflag = 'R')
       |GROUP BY s_name
       |ORDER BY numwait DESC, s_name ASC
       |LIMIT $k""".stripMargin
}
