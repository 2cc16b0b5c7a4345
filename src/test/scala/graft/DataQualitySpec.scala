package graft

import org.apache.spark.sql.functions._
import graft.operators.DataQuality
import graft.sources.Tables

/** The profiler against direct recomputes, and the rule engine against a
  * synthetic frame with KNOWN violations (the fixture is clean, so only
  * synthetic data exercises non-zero counts). */
class DataQualitySpec extends SparkSpec {

  test("profile: one row per column; nulls/distinct/min/max match direct recomputes") {
    val rows = DataQuality.profileLineitem(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted
      .sameElements(DataQuality.LineitemCols.sorted))
    val li = Tables.lineitem(spark, sf)
    assert(rows.forall(_.getAs[Long]("n_nulls") == 0L)) // fixture is complete
    for (c <- Seq("l_returnflag", "l_suppkey", "l_quantity")) {
      val r = rows.find(_.getString(0) == c).get
      assert(r.getAs[Long]("n_distinct") == li.select(c).distinct().count())
    }
    val flag = rows.find(_.getString(0) == "l_returnflag").get
    assert(flag.getAs[String]("min_val") == "A" && flag.getAs[String]("max_val") == "R")
    val qty = rows.find(_.getString(0) == "l_quantity").get
    // doubles render through the shared DECIMAL(18,2) cast: fixed 2dp
    assert(qty.getAs[String]("min_val") == "1.00" && qty.getAs[String]("max_val") == "50.00")
  }

  test("dq_checks: clean fixture reports EVERY rule with zero violations") {
    val rows = DataQuality.dqChecks(spark, sf).collect()
    val allRules = (DataQuality.LineitemRules ++ DataQuality.OrdersRules).map(_._1) ++
      Seq("lineitem.orphan_orderkey", "orders.orphan_custkey")
    assert(rows.map(_.getString(0)).sorted.sameElements(allRules.sorted))
    assert(rows.forall(_.getAs[Long]("n_violations") == 0L))
    val liCount = Tables.lineitem(spark, sf).count()
    assert(rows.filter(_.getString(0).startsWith("lineitem."))
      .forall(_.getAs[Long]("n_checked") == liCount))
  }

  test("profile double render: fixed-point, signed-zero-collapsing, 2dp-injective") {
    import spark.implicits._
    // the shared DECIMAL(18,2) render used by the double-typed profile
    // columns: -0.0 and 0.0 must count as ONE distinct (matching
    // COUNT(DISTINCT) on both engines), 2-decimal money stays injective
    val vals = Seq(0.0, -0.0, 1.5, -1.5).toDF("v")
    assert(vals.selectExpr("CAST(CAST(v AS DECIMAL(18,2)) AS STRING) AS s")
      .distinct().count() == 3)
    // large money values render fixed-point — Java's Double.toString
    // flips to scientific notation at >=1e7 (the cross-engine divergence
    // the decimal render exists to remove)
    val big = Seq(12345678.25).toDF("v")
    assert(big.selectExpr("CAST(CAST(v AS DECIMAL(18,2)) AS STRING) AS s")
      .head().getString(0) == "12345678.25")
    assert(big.selectExpr("CAST(v AS STRING) AS s")
      .head().getString(0).toLowerCase.contains("e")) // the pinned bug
  }

  test("cogroup reconcile: classes partition all orders; every class fires on real rows") {
    import spark.implicits._
    val rows = DataQuality.ordersReconcile(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == Tables.orders(spark, sf).count())
    // the three classes partition each status row exactly
    assert(rows.forall(r => r.getAs[Long]("n_no_lines") +
      r.getAs[Long]("n_contiguous") + r.getAs[Long]("n_broken") ==
      r.getAs[Long]("n_orders")))
    // the fixture's line numbering is genuinely dirty (random 1..7 with
    // dups), so ALL three classes are exercised by real rows — the
    // audit's non-zero counts are what the oracle hash-verifies
    assert(rows.map(_.getAs[Long]("n_no_lines")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_contiguous")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_broken")).sum > 0)
    // planted defects: order 2 has a gap (1,3), order 3 duplicates (1,1),
    // order 4 has no lines at all, order 5 starts at 2
    val orders = Seq((1L, "F"), (2L, "F"), (3L, "O"), (4L, "O"), (5L, "O"))
      .toDF("o_orderkey", "o_orderstatus")
    val lines = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 1L),
      (5L, 2L)).toDF("l_orderkey", "l_linenumber")
    val got = DataQuality.reconcileCore(orders, lines).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_orders"),
        r.getAs[Long]("n_no_lines"), r.getAs[Long]("n_contiguous"),
        r.getAs[Long]("n_broken"))).toMap
    assert(got == Map("F" -> ((2L, 0L, 1L, 1L)), "O" -> ((3L, 1L, 0L, 2L))))
  }

  test("winsorize readout: thresholds and tail counts match a driver-side type-7 replay") {
    val rows = graft.operators.TextAnalysis.docLengthWinsor(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCols = Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("source", "n_chars").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    def t7(xs: Seq[Long], q: Double): Double = {
      val pos = q * (xs.length - 1)
      val lo = xs(pos.toInt); val hi = xs(math.min(pos.toInt + 1, xs.length - 1))
      lo.toDouble + (pos - math.floor(pos)) * (hi.toDouble - lo.toDouble)
    }
    rows.foreach { r =>
      val xs = byCols(r.getString(0))
      val (p05, p95) = (t7(xs, 0.05), t7(xs, 0.95))
      assert(r.getAs[Double]("p05_chars") == p05 && r.getAs[Double]("p95_chars") == p95)
      assert(r.getAs[Long]("n_clipped_lo") == xs.count(_ < p05))
      assert(r.getAs[Long]("n_clipped_hi") == xs.count(_ > p95))
      assert(r.getAs[Long]("n_docs") == xs.length)
      // the clip touches at most ~5% per tail by construction
      assert(r.getAs[Long]("n_clipped_lo") <= xs.length / 10 &&
        r.getAs[Long]("n_clipped_hi") <= xs.length / 10)
    }
  }

  test("rule engine: known violations are counted, per rule, in one pass") {
    import spark.implicits._
    val bad = Seq(
      (1L, 10.0, 0.05, "A"),   // clean
      (2L, -5.0, 0.05, "N"),   // nonpositive price
      (3L, 10.0, 0.9, "R"),    // discount out of range
      (4L, -1.0, 0.7, "X"))    // all three
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag")
    val rules = DataQuality.LineitemRules.filter { case (name, _) =>
      !name.contains("quantity") && !name.contains("null_orderkey")
    }
    val got = DataQuality.tableReport(bad, rules).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_violations")).toMap
    assert(got == Map(
      "lineitem.nonpositive_price" -> 2L,
      "lineitem.discount_range" -> 2L,
      "lineitem.flag_domain" -> 1L))
    assert(DataQuality.tableReport(bad, rules).collect()
      .forall(_.getAs[Long]("n_checked") == 4L))
  }
}
