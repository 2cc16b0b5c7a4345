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
    assert(qty.getAs[String]("min_val") == "1.0" && qty.getAs[String]("max_val") == "50.0")
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
