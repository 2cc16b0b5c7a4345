package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.sources.Tables

/** TPC-H-shaped analogs q4/q6/q12/q14/q16/q18/q19/q22 over the harness
  * fixtures — the join/predicate shapes the earlier analogs (q1/q2/q3/
  * q5/q7/q10 in [[RefQueries]]/[[AnalyticsExt]]) don't cover:
  *
  *  - q4: EXISTS → LEFT SEMI join (only keys shuffle; the probe side
  *    never materializes matched rows, so a hot order with 10^6
  *    lineitems still contributes one semi-hit).
  *  - q6: the pure single-scan aggregate — every predicate lands in
  *    `PushedFilters`, no join, no shuffle beyond one partial/final agg.
  *  - q12: conditional aggregation (COUNT(CASE …)) — two measures from
  *    one pass instead of two scans.
  *  - q14: a ratio of two conditional exact-money sums computed in ONE
  *    aggregate over one scan.
  *  - q16: NOT IN → LEFT ANTI join + COUNT(DISTINCT) — the anti side is
  *    a tiny key set (broadcast), the distinct runs partial on the
  *    (group, suppkey) pairs before the exchange.
  *  - q18: HAVING on a grouped subquery used as a join input — the
  *    filter collapses the fact table to qualifying keys BEFORE the
  *    dimension joins.
  *  - q19: a 3-way disjunctive predicate over join columns — Catalyst
  *    extracts the common `l_partkey = p_partkey` conjunct so the plan
  *    is an equi-join with the disjunction as a post-join filter, plus
  *    scan-level `p_brand IN (…)` / quantity-range pushdown from the
  *    disjunction's per-arm bounds (never a cartesian).
  *  - q22: a 1-row scalar aggregate broadcast into a predicate + a
  *    time-scoped NOT EXISTS anti join.
  *
  * These adapt the official column sets to the fixture schema (no
  * receipt/commit dates, ship modes, or containers in FIXTURES.md §C);
  * the operator shapes are the point, per the reference's own
  * query-shape inventory (`Query 2/README.md`, SURVEY.md §2.8).
  *
  * Money/quantity arithmetic follows the [[RefQueries]] exact
  * fixed-point discipline so every aggregate is partition-order
  * independent and bit-identical to the DuckDB oracle.
  */
object TpchExt {

  import RefQueries.{cents, revenueTermExact}

  // ---------------------------------------------------------------- q4

  val Q4Start = "1996-07-01"
  val Q4End = "1996-10-01"

  /** TPC-H Q4 analog — order-priority checking: orders placed in one
    * quarter that had at least one returned lineitem (the fixture has
    * no commit/receipt dates, so `l_returnflag = 'R'` stands in for
    * "late"), counted per priority. The EXISTS is a LEFT SEMI join:
    * only `l_orderkey` leaves the lineitem scan, and a multi-match
    * order costs one output row, not a fan-out. */
  def q4OrderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val returned = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(Q4Start).cast("timestamp") &&
             col("o_orderdate") < lit(Q4End).cast("timestamp"))
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority").asc)
  }

  val q4OrderPrioritySql: String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM orders
       |WHERE o_orderdate >= TIMESTAMP '$Q4Start'
       |  AND o_orderdate < TIMESTAMP '$Q4End'
       |  AND EXISTS (SELECT 1 FROM lineitem
       |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority ASC""".stripMargin

  // ---------------------------------------------------------------- q6

  val Q6Year = 1996

  /** TPC-H Q6 analog — the forecasting-revenue-change query: a single
    * selective scan-aggregate, Σ price·discount for one ship-year, a
    * discount band, and small quantities. Every predicate is
    * scan-pushable and the plan is
    * `Scan(filters) → partial agg → 1-row exchange → final agg` — the
    * canonical "no join needed" baseline. The product of two exact
    * cent-integers is summed in DECIMAL(38,0) and scaled back by one
    * IEEE division (price·discount = centsₚ·cents_d / 10⁴). */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(s"$Q6Year-01-01").cast("timestamp") &&
             col("l_shipdate") < lit(s"${Q6Year + 1}-01-01").cast("timestamp") &&
             col("l_discount").between(0.02, 0.04) &&
             col("l_quantity") < 24)
      .agg((sum((cents(col("l_extendedprice")) * cents(col("l_discount")))
          .cast(DecimalType(38, 0))).cast("double") / 10000.0).as("revenue"))

  val q6ForecastRevenueSql: String =
    s"""SELECT CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
       |                    CAST(ROUND(l_discount * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE)
       |       / 10000.0 AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '$Q6Year-01-01'
       |  AND l_shipdate < TIMESTAMP '${Q6Year + 1}-01-01'
       |  AND l_discount BETWEEN 0.02 AND 0.04
       |  AND l_quantity < 24""".stripMargin

  // --------------------------------------------------------------- q12

  val Q12Year = 1996
  val Q12HighPriorities = Seq("1-URGENT", "2-HIGH")

  /** TPC-H Q12 analog — priority classes per return flag (the fixture
    * has no ship modes; `l_returnflag` plays the grouping role): one
    * lineitem⋈orders pass emits BOTH the high- and low-priority counts
    * via conditional aggregation, instead of two scans or a pivot.
    * COUNT(CASE …) keeps the counts BIGINT on both engines. */
  def q12PriorityClass(spark: SparkSession, sfDir: String): DataFrame = {
    val isHigh = col("o_orderpriority").isin(Q12HighPriorities: _*)
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(s"$Q12Year-01-01").cast("timestamp") &&
             col("l_shipdate") < lit(s"${Q12Year + 1}-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(when(isHigh, 1)).as("high_line_count"),
           count(when(!isHigh, 1)).as("low_line_count"))
      .orderBy(col("l_returnflag").asc)
  }

  val q12PriorityClassSql: String = {
    val inList = Q12HighPriorities.map(p => s"'$p'").mkString(", ")
    s"""SELECT l_returnflag,
       |       COUNT(CASE WHEN o_orderpriority IN ($inList) THEN 1 END) AS high_line_count,
       |       COUNT(CASE WHEN o_orderpriority NOT IN ($inList) THEN 1 END) AS low_line_count
       |FROM lineitem, orders
       |WHERE l_orderkey = o_orderkey
       |  AND l_shipdate >= TIMESTAMP '$Q12Year-01-01'
       |  AND l_shipdate < TIMESTAMP '${Q12Year + 1}-01-01'
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag ASC""".stripMargin
  }

  // --------------------------------------------------------------- q14

  val Q14Month = "1996-09-01"
  val Q14MonthEnd = "1996-10-01"

  /** TPC-H Q14 analog — promotion effect: the % of one month's revenue
    * carried by PROMO-type parts. Both the conditional numerator and
    * the denominator accumulate as exact unscaled decimals in a SINGLE
    * aggregate over the lineitem⋈part join, and the only float math is
    * the final (num·100)/den — identical expression order on both
    * engines, so correctly-rounded-identical output. */
  def q14PromoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val term = revenueTermExact(col("l_extendedprice"), col("l_discount"))
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(Q14Month).cast("timestamp") &&
             col("l_shipdate") < lit(Q14MonthEnd).cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(Tables.part(spark, sfDir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", term)
               .otherwise(lit(0).cast(DecimalType(38, 0)))).as("num"),
           sum(term).as("den"))
      .select((col("num").cast("double") * 100.0 / col("den").cast("double"))
        .as("promo_revenue"))
  }

  val q14PromoRevenueSql: String =
    s"""WITH t AS (
       |  SELECT SUM(CASE WHEN p_type = 'PROMO'
       |             THEN ${RefQueries.revenueTermExactSql("l_extendedprice", "l_discount")}
       |             ELSE CAST(0 AS DECIMAL(38,0)) END) AS num,
       |         ${RefQueries.revenueCentsExactSql("l_extendedprice", "l_discount")} AS den
       |  FROM lineitem, part
       |  WHERE l_partkey = p_partkey
       |    AND l_shipdate >= TIMESTAMP '$Q14Month'
       |    AND l_shipdate < TIMESTAMP '$Q14MonthEnd')
       |SELECT CAST(num AS DOUBLE) * 100.0 / CAST(den AS DOUBLE) AS promo_revenue
       |FROM t""".stripMargin

  // --------------------------------------------------------------- q16

  val Q16Sizes = Seq(1, 14, 23, 45)

  /** TPC-H Q16 analog — parts/supplier relationship: how many distinct
    * suppliers ship each (brand, type, size) combination, excluding
    * suppliers in bad standing (negative balance; the fixture has no
    * complaint comments). The NOT IN compiles to a LEFT ANTI join whose
    * build side is a handful of keys (broadcast), and COUNT(DISTINCT)
    * partial-aggregates (group, suppkey) pairs before the exchange, so
    * the shuffle carries distinct pairs, not lineitem rows. The fixture
    * has no partsupp table; lineitem provides the part↔supplier map. */
  def q16SupplierCount(spark: SparkSession, sfDir: String): DataFrame = {
    val badSupp = Tables.supplier(spark, sfDir)
      .where(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(Tables.part(spark, sfDir)
          .where(col("p_size").isin(Q16Sizes: _*) && col("p_type") =!= "PROMO")
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  val q16SupplierCountSql: String = {
    val sizeList = Q16Sizes.mkString(", ")
    s"""SELECT p_brand, p_type, p_size,
       |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |  AND p_size IN ($sizeList)
       |  AND p_type <> 'PROMO'
       |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size
       |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin
  }

  // --------------------------------------------------------------- q18

  val Q18MinQty = 150L

  /** TPC-H Q18 analog — large-volume customers: the top-K orders whose
    * total quantity exceeds [[Q18MinQty]], with their customer. The
    * grouped HAVING subquery runs FIRST, collapsing lineitem to the few
    * qualifying order keys, so the orders/customer joins see a tiny
    * probe side (broadcast-able at any corpus size — the qualifying
    * set is bounded by the quantity threshold, not the corpus).
    * Quantities are integral doubles; they sum as BIGINT on both
    * engines so the HAVING boundary can't float-flake. */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val k = graft.GraftConf.topK(spark)
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(LongType)).as("total_qty"))
      .where(col("total_qty") > Q18MinQty)
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
      .limit(k)
  }

  def q18LargeOrdersSql(k: Int = graft.GraftConf.DefaultTopK): String =
    s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
       |FROM orders, customer,
       |     (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
       |      FROM lineitem GROUP BY l_orderkey
       |      HAVING SUM(CAST(l_quantity AS BIGINT)) > $Q18MinQty) big
       |WHERE o_orderkey = big.l_orderkey
       |  AND o_custkey = c_custkey
       |ORDER BY total_qty DESC, o_orderkey ASC
       |LIMIT $k""".stripMargin

  // --------------------------------------------------------------- q19

  /** (brand, max size, quantity band) arms of the q19 disjunction —
    * widened vs the official constants so every fixture SF matches. */
  val Q19Arms = Seq(("Brand#12", 15, 1, 15), ("Brand#23", 20, 10, 25),
    ("Brand#24", 25, 20, 35))

  /** TPC-H Q19 analog — discounted revenue under a three-arm
    * disjunctive predicate spanning both join sides. Catalyst keeps the
    * common `l_partkey = p_partkey` equi-conjunct as the join key (no
    * cartesian — the blanket PropertiesSpec audit would catch one) and
    * pushes the single-side residuals (`p_brand IN (…)`,
    * `l_quantity <= max`) into the scans. */
  def q19DisjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val arms = Q19Arms.map { case (brand, size, qlo, qhi) =>
      col("p_brand") === brand && col("p_size").between(1, size) &&
        col("l_quantity").between(qlo, qhi)
    }.reduce(_ || _)
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .where(arms)
      .agg(RefQueries.revenueExact(col("l_extendedprice"), col("l_discount"))
        .as("revenue"))
  }

  val q19DisjunctiveRevenueSql: String = {
    val arms = Q19Arms.map { case (brand, size, qlo, qhi) =>
      s"(p_brand = '$brand' AND p_size BETWEEN 1 AND $size AND l_quantity BETWEEN $qlo AND $qhi)"
    }.mkString("\n   OR ")
    s"""SELECT ${RefQueries.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |  AND ($arms)""".stripMargin
  }

  // --------------------------------------------------------------- q22

  val Q22Cutoff = "2000-01-01"

  /** TPC-H Q22 analog — dormant high-balance customers: per market
    * segment, customers whose balance beats the positive-balance
    * average and who placed no order since [[Q22Cutoff]]. The global
    * average is a 1-row aggregate broadcast into the predicate
    * (`crossJoin` of a scalar — the established pattern, never
    * corpus-scale), and the comparison runs ALL-INTEGER
    * (cents·count > Σcents) so no engine's division rounding can flip a
    * boundary row. The NOT EXISTS is a LEFT ANTI join probing only the
    * date-filtered order keys. */
  def q22DormantCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val posStats = cust.where(col("c_acctbal") > 0)
      .agg(count(lit(1)).as("pos_cnt"),
           sum(cents(col("c_acctbal"))).as("pos_cents"))
    val recent = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(Q22Cutoff).cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(posStats))
      .where(cents(col("c_acctbal")) * col("pos_cnt") > col("pos_cents"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
           RefQueries.sumMoneyExact(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_mktsegment").asc)
  }

  /** Suppliers whose balance beats their own nation's average — the
    * CORRELATED scalar-subquery shape (the SQL twin carries two
    * correlated subqueries, which both engines decorrelate to grouped
    * joins). The DataFrame side expresses the decorrelated form
    * directly: per-nation count and cent-sum as window aggregates over
    * the one nation-partitioned exchange, compared ALL-INTEGER
    * (cents·n > Σcents) so no average is ever materialized as a float.
    * A nation with a single supplier can never beat its own average —
    * strict inequality — which is why the sf0.001 fixture (one supplier
    * per nation) yields zero rows; sf0.01+ exercises it. */
  def aboveAvgSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("s_nationkey"))
    Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
        count(lit(1)).over(w).as("n"),
        sum(cents(col("s_acctbal"))).over(w).as("sum_cents"))
      .where(cents(col("s_acctbal")) * col("n") > col("sum_cents"))
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      .orderBy(col("s_suppkey").asc)
  }

  val aboveAvgSuppliersSql: String =
    s"""SELECT s_suppkey, s_nationkey, s_acctbal
       |FROM supplier s
       |WHERE CAST(ROUND(s_acctbal * 100) AS BIGINT)
       |      * (SELECT COUNT(*) FROM supplier s2
       |         WHERE s2.s_nationkey = s.s_nationkey)
       |      > (SELECT SUM(CAST(ROUND(s2.s_acctbal * 100) AS BIGINT)) FROM supplier s2
       |         WHERE s2.s_nationkey = s.s_nationkey)
       |ORDER BY s_suppkey ASC""".stripMargin

  val q22DormantCustomersSql: String =
    s"""WITH pos AS (SELECT count(*) AS pos_cnt,
       |                    SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS pos_cents
       |             FROM customer WHERE c_acctbal > 0)
       |SELECT c_mktsegment, count(*) AS numcust,
       |       ${RefQueries.sumMoneyExactSql("c_acctbal")} AS totacctbal
       |FROM customer, pos
       |WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * pos_cnt > pos_cents
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderdate >= TIMESTAMP '$Q22Cutoff')
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment ASC""".stripMargin
}
