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

  /** CUBE over the pricing flags: every grouping set — per-(flag,status),
    * per-flag, per-status, grand total — in one pass. Like ROLLUP this
    * is one Expand + one shuffle with partial aggregation per grouping
    * set; the extra per-status stratum costs one more Expand projection,
    * not another scan. */
  def cubePricing(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val cubePricingSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |       COUNT(*) AS n_rows,
       |       ${RefQueries.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem
       |GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS — the strata CUBE and ROLLUP cannot express
    * alone: per-flag and per-status subtotals WITHOUT the combined or
    * grand-total rows. Same one-Expand-one-shuffle plan family as
    * [[rollupPricing]]/[[cubePricing]], two projections instead of
    * three/four. */
  def groupingSetsPricing(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val groupingSetsPricingSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |       COUNT(*) AS n_rows,
       |       ${RefQueries.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
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

  /** Set operation: suppliers shipping in BOTH 1996 and 1997 (INTERSECT
    * distinct semantics — the dual of [[exceptSuppliers]]). Catalyst
    * plans this as a left-semi join over the two filtered scans, each
    * with its date predicate pushed to parquet. */
  def intersectSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    def active(year: Int) = li
      .where(col("l_shipdate").between(lit(s"$year-01-01"), lit(s"$year-12-31 23:59:59")))
      .select(col("l_suppkey"))
    active(1996).intersect(active(1997)).orderBy(col("l_suppkey").asc)
  }

  val intersectSuppliersSql: String =
    """SELECT l_suppkey FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59'
      |INTERSECT
      |SELECT l_suppkey FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31 23:59:59'
      |ORDER BY l_suppkey ASC""".stripMargin

  /** Exact median quantity per return flag. Quantities are integral, so
    * the even-count midpoint average is exact (x.0 / x.5) and identical
    * across engines. Computed from a (flag, quantity)-count histogram
    * ([[ExactQuantiles]]) rather than the buffering `median` aggregate:
    * per-group state is O(distinct quantities) — ~50 for TPC-H — not
    * O(rows), so a hot return flag cannot OOM an executor. */
  def medianQuantity(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = Tables.lineitem(spark, sfDir)
      .where(col("l_quantity").isNotNull)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    ExactQuantiles.fromHistogram(hist, Seq("l_returnflag"), "l_quantity", "cnt",
        Seq("median_qty" -> 0.5), extraAggs = Seq(sum(col("cnt")).as("n")))
      .select(col("l_returnflag"), col("median_qty"), col("n"))
      .orderBy(col("l_returnflag").asc)
  }

  /** Oracle: explicit [[ExactQuantiles]] replay rather than DuckDB's
    * `median` — same rationale as `sourceProfileSql`. */
  val medianQuantitySql: String =
    s"""WITH r AS (SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
       |           FROM lineitem WHERE l_quantity IS NOT NULL
       |           GROUP BY l_returnflag, l_quantity),
       |w AS (SELECT l_returnflag, l_quantity, cnt,
       |             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC
       |                            ROWS UNBOUNDED PRECEDING) AS cum,
       |             SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
       |      FROM r),
       |agg AS (SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
       |               ${ExactQuantiles.replaySelectSql("0.5", "med", "l_quantity")}
       |        FROM w GROUP BY l_returnflag)
       |SELECT l_returnflag,
       |       ${ExactQuantiles.replayInterpSql("med")} AS median_qty,
       |       n
       |FROM agg
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

  /** Parameters for the TPC-H Q3-style shipping-priority query. */
  val Q3Segment = "BUILDING"
  val Q3Date = "1997-06-01"

  /** TPC-H Q3 analog — the canonical THREE-way join the reference never
    * had: revenue of not-yet-shipped lineitems for orders placed before
    * [[Q3Date]] by [[Q3Segment]] customers, top-K orders by revenue.
    * Shape at scale: all three scans filter BEFORE their joins (segment
    * on customer, date on orders, date on lineitem — each pushed to the
    * parquet scan), the joins are 8-byte-key equi-joins (AQE broadcasts
    * the filtered customer side when it fits), and the top-K is a
    * TakeOrderedAndProject — never a global sort. */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val k = graft.GraftConf.topK(spark)
    val cust = Tables.customer(spark, sfDir)
      .where(col("c_mktsegment") === Q3Segment)
      .select(col("c_custkey"))
    val ords = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") < lit(Q3Date).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") > lit(Q3Date).cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(k)
  }

  def q3ShippingPrioritySql(k: Int = graft.GraftConf.DefaultTopK): String =
    s"""SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       |       ${RefQueries.revenueExactSql("l.l_extendedprice", "l.l_discount")} AS revenue
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |WHERE c.c_mktsegment = '$Q3Segment'
       |  AND o.o_orderdate < TIMESTAMP '$Q3Date'
       |  AND l.l_shipdate > TIMESTAMP '$Q3Date'
       |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
       |ORDER BY revenue DESC, l.l_orderkey ASC
       |LIMIT $k""".stripMargin

  /** Parameters for the TPC-H Q5-style local-supplier-volume query. */
  val Q5Region = "EUROPE"
  val Q5Year = 1996

  /** TPC-H Q5 analog — the six-table join: revenue per nation from
    * lineitems whose CUSTOMER and SUPPLIER share that nation, for
    * orders placed in [[Q5Year]], nations restricted to [[Q5Region]].
    * The widest join chain in the registry (region ⋈ nation ⋈ customer
    * ⋈ orders ⋈ lineitem ⋈ supplier) and the classic star-schema
    * shape: every filter reaches its own scan first (region name, the
    * order-date year), the dimension chain region→nation→customer
    * collapses to broadcastable row sets before touching a fact table,
    * and the co-nationality predicate (c_nationkey = s_nationkey) rides
    * the join keys instead of a post-join filter. Exact fixed-point
    * revenue; output ordered by revenue desc (Q5's own order) with the
    * nation tiebreak. */
  def q5LocalSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val nations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).where(col("r_name") === Q5Region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, sfDir)
      .join(nations, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val ords = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(s"$Q5Year-01-01").cast("timestamp") &&
             col("o_orderdate") < lit(s"${Q5Year + 1}-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  val q5LocalSupplierVolumeSql: String =
    s"""SELECT n_name,
       |       ${RefQueries.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey
       |  AND n_regionkey = r_regionkey
       |  AND r_name = '$Q5Region'
       |  AND o_orderdate >= TIMESTAMP '$Q5Year-01-01'
       |  AND o_orderdate < TIMESTAMP '${Q5Year + 1}-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name ASC""".stripMargin

  /** Parameters for the TPC-H Q7-style volume-shipping query. */
  val Q7NationA = "NATION_3"
  val Q7NationB = "NATION_7"

  /** TPC-H Q7 analog — volume shipping between two nations: revenue of
    * lineitems shipped 1996–1997 where the supplier sits in one of the
    * two nations and the ordering customer in the other, grouped by
    * (supplier nation, customer nation, ship year). Exercises the
    * SELF-ALIASED dimension (nation joined twice under different
    * roles), a disjunctive cross-nation predicate, and year extraction.
    * Shape: both nation lookups broadcast; the nation filter reaches
    * the supplier/customer joins as IN-list pushdown (each side can
    * only be one of the two nations), the date range is pushed to the
    * lineitem scan, and the disjunction runs on broadcast-joined name
    * columns — never a cartesian. */
  def q7VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val nations = Tables.nation(spark, sfDir)
      .where(col("n_name").isin(Q7NationA, Q7NationB))
    val supp = Tables.supplier(spark, sfDir)
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, sfDir)
      .join(nations, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate").between(
        lit("1996-01-01"), lit("1997-12-31 23:59:59")))
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .where((col("supp_nation") === Q7NationA && col("cust_nation") === Q7NationB) ||
             (col("supp_nation") === Q7NationB && col("cust_nation") === Q7NationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("supp_nation").asc, col("cust_nation").asc, col("l_year").asc)
  }

  val q7VolumeShippingSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |       ${RefQueries.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
       |FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |WHERE s_suppkey = l_suppkey
       |  AND o_orderkey = l_orderkey
       |  AND c_custkey = o_custkey
       |  AND s_nationkey = n1.n_nationkey
       |  AND c_nationkey = n2.n_nationkey
       |  AND ((n1.n_name = '$Q7NationA' AND n2.n_name = '$Q7NationB')
       |    OR (n1.n_name = '$Q7NationB' AND n2.n_name = '$Q7NationA'))
       |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31 23:59:59'
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation ASC, cust_nation ASC, l_year ASC""".stripMargin

  /** TPC-H Q10 analog — returned-item reporting: the top-K customers by
    * revenue lost to returns (l_returnflag = 'R') for orders placed in
    * one quarter. Filters pushed to both fact scans, nation broadcast,
    * TakeOrderedAndProject for the top-K. */
  val Q10Date = "1996-10-01"

  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    val k = graft.GraftConf.topK(spark)
    val ords = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(Q10Date).cast("timestamp") &&
             col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val cust = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
    li.join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)
  }

  def q10ReturnedItemsSql(k: Int = graft.GraftConf.DefaultTopK): String =
    s"""SELECT c_custkey, c_name, n_name,
       |       ${RefQueries.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
       |FROM customer, orders, lineitem, nation
       |WHERE c_custkey = o_custkey
       |  AND l_orderkey = o_orderkey
       |  AND o_orderdate >= TIMESTAMP '$Q10Date'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |  AND l_returnflag = 'R'
       |  AND c_nationkey = n_nationkey
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey ASC
       |LIMIT $k""".stripMargin

  /** Month-over-month revenue deltas via LAG — the window-navigation
    * surface ([[cumulativeRevenue]] covers running sums): both the
    * revenue and its previous-month twin stay exact integer cents until
    * the final scale-back, so the delta is an exact integer difference,
    * not a float subtraction. The single-partition window is
    * calendar-bounded (one row per month), as in [[cumulativeRevenue]].
    */
  def revenueMomGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("month").asc)
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate").isNotNull)
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(RefQueries.revenueCentsExact(col("l_extendedprice"), col("l_discount")).as("rc"))
      .withColumn("prev_rc", lag(col("rc"), 1).over(w))
      .select(col("month"),
        (col("rc").cast("double") / 10000.0).as("revenue"),
        (col("prev_rc").cast("double") / 10000.0).as("prev_revenue"),
        ((col("rc") - col("prev_rc")).cast("double") / 10000.0).as("mom_delta"))
      .orderBy(col("month").asc)
  }

  val revenueMomGrowthSql: String =
    s"""WITH m AS (SELECT date_trunc('month', l_shipdate) AS month,
       |                  ${RefQueries.revenueCentsExactSql("l_extendedprice", "l_discount")} AS rc
       |           FROM lineitem
       |           WHERE l_shipdate IS NOT NULL
       |           GROUP BY month)
       |SELECT month,
       |       CAST(rc AS DOUBLE) / 10000.0 AS revenue,
       |       CAST(LAG(rc, 1) OVER (ORDER BY month ASC) AS DOUBLE) / 10000.0 AS prev_revenue,
       |       CAST(rc - LAG(rc, 1) OVER (ORDER BY month ASC) AS DOUBLE) / 10000.0 AS mom_delta
       |FROM m
       |ORDER BY month ASC""".stripMargin

  /** Month-over-month revenue with a running cumulative total. The
    * cumulative sum runs over EXACT unscaled decimal cents
    * ([[RefQueries.revenueCentsExact]]) and scales back to dollars only
    * at the end — a double-typed running sum would depend on the
    * window aggregator's internal tree shape and flake the oracle hash.
    * The single-partition window is calendar-bounded (one row per
    * month), so its shape is irrelevant at any corpus size. */
  def cumulativeRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("month").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate").isNotNull)
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(RefQueries.revenueCentsExact(col("l_extendedprice"), col("l_discount")).as("rc"))
      .withColumn("cum", sum(col("rc")).over(w))
      .select(col("month"),
        (col("rc").cast("double") / 10000.0).as("revenue"),
        (col("cum").cast("double") / 10000.0).as("cum_revenue"))
      .orderBy(col("month").asc)
  }

  /** Trailing 7-CALENDAR-DAY revenue — the RANGE-frame window class
    * ([[cumulativeRevenue]] is ROWS-framed): the frame is a VALUE
    * interval over the day number, so calendar gaps matter — a day
    * following a 10-day quiet spell sums only itself, where a
    * `ROWS 6 PRECEDING` frame would wrongly reach back across the gap.
    * Same scale discipline as the cumulative query: the corpus
    * collapses to one exact-cents row per DAY first (bounded by the
    * date domain, not the row count), and only that bounded frame rides
    * the single ordered partition. All sums are exact decimals; the
    * two IEEE divisions at the end are per-row. */
  def trailingRangeRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("day_num").asc).rangeBetween(-6, 0)
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate").isNotNull)
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(RefQueries.revenueCentsExact(col("l_extendedprice"), col("l_discount")).as("rc"))
      .withColumn("day_num", datediff(col("day"), lit("1995-01-01").cast("date")))
      .withColumn("trail", sum(col("rc")).over(w))
      .select(col("day"),
        (col("rc").cast("double") / 10000.0).as("day_revenue"),
        (col("trail").cast("double") / 10000.0).as("trailing_7d_revenue"))
      .orderBy(col("day").asc)
  }

  val trailingRangeRevenueSql: String =
    s"""WITH d AS (SELECT CAST(l_shipdate AS DATE) AS day,
       |                  ${RefQueries.revenueCentsExactSql("l_extendedprice", "l_discount")} AS rc
       |           FROM lineitem
       |           WHERE l_shipdate IS NOT NULL
       |           GROUP BY day),
       |n AS (SELECT day, rc, day - DATE '1995-01-01' AS day_num FROM d)
       |SELECT day,
       |       CAST(rc AS DOUBLE) / 10000.0 AS day_revenue,
       |       CAST(SUM(rc) OVER (ORDER BY day_num ASC
       |                          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
       |         / 10000.0 AS trailing_7d_revenue
       |FROM n
       |ORDER BY day ASC""".stripMargin

  val cumulativeRevenueSql: String =
    s"""WITH m AS (SELECT date_trunc('month', l_shipdate) AS month,
       |                  ${RefQueries.revenueCentsExactSql("l_extendedprice", "l_discount")} AS rc
       |           FROM lineitem
       |           WHERE l_shipdate IS NOT NULL
       |           GROUP BY month)
       |SELECT month,
       |       CAST(rc AS DOUBLE) / 10000.0 AS revenue,
       |       CAST(SUM(rc) OVER (ORDER BY month ASC
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |         / 10000.0 AS cum_revenue
       |FROM m
       |ORDER BY month ASC""".stripMargin
}
