package graft

import graft.operators.RefQueries
import graft.sources.Tables

class RefQueriesSpec extends SparkSpec {

  test("q1a: top-K revenue is descending with ascending-key tiebreak") {
    val rows = RefQueries.q1aTopRevenue(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("q1b: quantities are positive and keys unique") {
    val rows = RefQueries.q1bTopQuantity(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("l_partkey")).distinct.length == rows.length)
    assert(rows.forall(_.getAs[Double]("num_sold") > 0))
  }

  test("q2: exactly first K suppliers ascending, revenue never null") {
    val rows = RefQueries.q2SupplierRevenueJoin(spark, sf).collect()
    val keys = rows.map(_.getAs[Long]("s_suppkey"))
    assert(keys.sameElements(keys.sorted))
    assert(rows.forall(!_.isNullAt(1)))
  }

  test("eda: row count matches a direct count") {
    val n = RefQueries.edaLineitemStats(spark, sf).collect()(0).getAs[Long]("n_rows")
    assert(n == Tables.lineitem(spark, sf).count())
  }

  test("pricing summary groups partition the table") {
    val df = RefQueries.aggPricingSummary(spark, sf).collect()
    assert(df.map(_.getAs[Long]("count_order")).sum == Tables.lineitem(spark, sf).count())
  }

  test("runtime parameters thread through spark.conf (reference CLI-args parity)") {
    // sf0.01 — the sf0.001 fixture has only 10 suppliers, too few for k=20
    val dir = "/root/testdata/sf0.01"
    val params = Seq(GraftConf.TopKKey -> "20",
      GraftConf.Q1StartKey -> "1996-01-01", GraftConf.Q1EndKey -> "1996-12-31 23:59:59")
    try {
      params.foreach { case (k, v) => spark.conf.set(k, v) }
      val viaConf = RefQueries.q1aTopRevenue(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      // the conf path must equal the explicit-parameter path...
      val explicit = RefQueries.q1aTopRevenue(spark, dir, 20, "1996-01-01", "1996-12-31 23:59:59")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(viaConf.sameElements(explicit))
      assert(viaConf.length == 20)
      // ...and differ from the default range (narrower window, lower revenue)
      spark.conf.unset(GraftConf.Q1StartKey); spark.conf.unset(GraftConf.Q1EndKey)
      val defaults = RefQueries.q1aTopRevenue(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(defaults.length == 20 && !defaults.sameElements(viaConf))
      // the parameterized SQL twin text carries the same knobs
      assert(RefQueries.q1aSqlWith(20, "1996-01-01", "1996-12-31 23:59:59").contains("LIMIT 20"))
      assert(RefQueries.q1aSql == RefQueries.q1aSqlWith())
    } finally params.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("q1a pushes the date range and null filters into the parquet scan") {
    // the PLANS.md claim, pinned: at 100 TB a filter that misses the
    // scan re-reads the whole fact table
    val plan = graft.operators.RefQueries.q1aTopRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("l_shipdate"),
      s"shipdate filter not pushed to scan:\n$plan")
    // and the scan is pruned to the columns the query touches
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_comment") && !read.contains("l_tax"),
      s"scan reads untouched columns: $read")
  }

  test("revenue is invariant under repartitioning (exact arithmetic)") {
    val base = RefQueries.q1aTopRevenue(spark, sf).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val repart = Tables.lineitem(spark2, sf).repartition(13)
    repart.createOrReplaceTempView("lineitem_repart")
    val again = repart
      .where(col("l_shipdate").between(lit("1996-01-01"), lit("1997-12-31 23:59:59"))
        && col("l_suppkey").isNotNull && col("l_extendedprice").isNotNull && col("l_discount").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_suppkey").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(base.sameElements(again))
  }

  test("q3 shipping priority: filters hold on every surviving order; ordered top-K") {
    import org.apache.spark.sql.functions.col
    import graft.operators.AnalyticsExt
    val rows = AnalyticsExt.q3ShippingPriority(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= GraftConf.DefaultTopK)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    // o_orderdate is TIMESTAMP_NTZ in the fixture → LocalDateTime externally
    val cutoff = java.time.LocalDateTime.parse(s"${AnalyticsExt.Q3Date}T00:00")
    rows.foreach(r =>
      assert(r.getAs[java.time.LocalDateTime]("o_orderdate").isBefore(cutoff)))
    // every reported order really belongs to a segment customer
    val segOrders = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .where(col("c_mktsegment") === AnalyticsExt.Q3Segment),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(segOrders(r.getAs[Long]("l_orderkey"))))
  }

  test("cumulative revenue is the running total of the monthly revenues") {
    import graft.operators.AnalyticsExt
    val rows = AnalyticsExt.cumulativeRevenue(spark, sf).collect()
    assert(rows.nonEmpty)
    var run = 0.0
    rows.foreach { r =>
      run += r.getAs[Double]("revenue")
      assert(math.abs(r.getAs[Double]("cum_revenue") - run) < 1e-6 * math.max(1.0, run))
    }
    // months are strictly increasing
    val ms = rows.map(_.getAs[java.sql.Timestamp]("month"))
    assert(ms.zip(ms.tail).forall { case (a, b) => a.before(b) })
  }
}
