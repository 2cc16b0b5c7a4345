package graft

import org.apache.spark.sql.functions._
import graft.operators.TpchExt
import graft.sources.Tables

/** Semantic cross-checks for the q4/q6/q12/q14/q16/q18/q19/q22 analogs:
  * each result is recomputed through an INDEPENDENT (usually driver-side
  * brute-force) formulation, and the join-strategy shapes the scaladocs
  * promise (semi/anti, no cartesian) are pinned on the physical plan. */
class TpchExtSpec extends SparkSpec {

  private def cents(d: Double): Long = math.round(d * 100)

  test("q4: semi-join counts orders once regardless of lineitem fan-out") {
    val df = TpchExt.q4OrderPriority(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("LeftSemi"))
    val total = df.collect().map(_.getAs[Long]("order_count")).sum
    // independent recompute: distinct order keys via inner join + distinct
    val expected = Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lit(TpchExt.Q4Start).cast("timestamp") &&
             col("o_orderdate") < lit(TpchExt.Q4End).cast("timestamp"))
      .join(Tables.lineitem(spark, sf).where(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey")).distinct().count()
    assert(total == expected && total > 0)
  }

  test("q6: single-scan aggregate matches driver-side exact arithmetic") {
    val got = TpchExt.q6ForecastRevenue(spark, sf).collect()(0).getAs[Double]("revenue")
    val rows = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit(s"${TpchExt.Q6Year}-01-01").cast("timestamp") &&
             col("l_shipdate") < lit(s"${TpchExt.Q6Year + 1}-01-01").cast("timestamp") &&
             col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .select(col("l_extendedprice"), col("l_discount")).collect()
    val exact = rows.map(r => BigInt(cents(r.getDouble(0))) * BigInt(cents(r.getDouble(1)))).sum
    assert(got == exact.toDouble / 10000.0 && got > 0)
  }

  test("q12: high/low conditional counts partition the joined rows") {
    val rows = TpchExt.q12PriorityClass(spark, sf).collect()
    val total = rows.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    val joined = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit(s"${TpchExt.Q12Year}-01-01").cast("timestamp") &&
             col("l_shipdate") < lit(s"${TpchExt.Q12Year + 1}-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
    assert(total == joined.count())
    // the split itself, recomputed independently: a wrong priority
    // constant would dump everything into low and still partition
    val high = rows.map(_.getAs[Long]("high_line_count")).sum
    val expectedHigh = joined
      .where(col("o_orderpriority").isin(TpchExt.Q12HighPriorities: _*)).count()
    assert(high == expectedHigh && high > 0 && high < total)
  }

  test("q14: promo share matches brute-force ratio and sits in (0, 100)") {
    val got = TpchExt.q14PromoRevenue(spark, sf).collect()(0).getAs[Double]("promo_revenue")
    val rows = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit(TpchExt.Q14Month).cast("timestamp") &&
             col("l_shipdate") < lit(TpchExt.Q14MonthEnd).cast("timestamp"))
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("p_type"), col("l_extendedprice"), col("l_discount")).collect()
    val terms = rows.map { r =>
      val t = BigInt(cents(r.getDouble(1))) * BigInt(100 - cents(r.getDouble(2)))
      (if (r.getString(0) == "PROMO") t else BigInt(0), t)
    }
    val (num, den) = (terms.map(_._1).sum, terms.map(_._2).sum)
    assert(got == num.toDouble * 100.0 / den.toDouble)
    assert(got > 0 && got < 100)
  }

  test("q16: anti-join excludes negative-balance suppliers from every group") {
    // sf0.01 — the sf0.001 fixture has NO negative-balance supplier, so
    // the exclusion under test would be vacuous there
    val dir = "/root/testdata/sf0.01"
    val df = TpchExt.q16SupplierCount(spark, dir)
    assert(df.queryExecution.executedPlan.toString.contains("LeftAnti"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("supplier_cnt") > 0))
    // recompute the total distinct (group, supplier) pairs without the
    // anti side and check the excluded suppliers explain the difference
    val bad = Tables.supplier(spark, dir).where(col("s_acctbal") < 0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(bad.nonEmpty) // the exclusion must actually fire
    val pairs = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir)
          .where(col("p_size").isin(TpchExt.Q16Sizes: _*) && col("p_type") =!= "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
      .distinct().collect()
    val expected = pairs.filterNot(r => bad.contains(r.getLong(3)))
      .groupBy(r => (r.getString(0), r.getString(1), r.getInt(2))).view.mapValues(_.length)
    assert(rows.map(r => ((r.getString(0), r.getString(1), r.getInt(2)),
      r.getAs[Long]("supplier_cnt").toInt)).toMap == expected.toMap)
  }

  test("q18: every surviving order beats the quantity floor, ordered desc") {
    val rows = TpchExt.q18LargeOrders(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= GraftConf.topK(spark))
    val qs = rows.map(_.getAs[Long]("total_qty"))
    assert(qs.forall(_ > TpchExt.Q18MinQty))
    assert(qs.sameElements(qs.sorted(Ordering[Long].reverse)))
    // orders qualify independently of the join: recompute one
    val first = rows.head
    val direct = Tables.lineitem(spark, sf)
      .where(col("l_orderkey") === first.getAs[Long]("o_orderkey"))
      .agg(sum(col("l_quantity").cast("long"))).collect()(0).getLong(0)
    assert(direct == first.getAs[Long]("total_qty"))
  }

  test("q19: disjunctive filter keeps the equi-join (no cartesian) and exact revenue") {
    val df = TpchExt.q19DisjunctiveRevenue(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val got = df.collect()(0).getAs[Double]("revenue")
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_size"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount")).collect()
    val exact = rows.filter { r =>
      TpchExt.Q19Arms.exists { case (b, s, qlo, qhi) =>
        r.getString(0) == b && r.getInt(1) >= 1 && r.getInt(1) <= s &&
          r.getDouble(2) >= qlo && r.getDouble(2) <= qhi
      }
    }.map(r => BigInt(cents(r.getDouble(3))) * BigInt(100 - cents(r.getDouble(4)))).sum
    assert(got == exact.toDouble / 10000.0 && got > 0)
  }

  test("above_avg: correlated-subquery result matches brute-force per-nation means") {
    // sf0.01 — one supplier per nation at sf0.001 means nobody beats
    // their own average (strict inequality), an empty (vacuous) check
    val dir = "/root/testdata/sf0.01"
    val got = TpchExt.aboveAvgSuppliers(spark, dir).collect()
      .map(_.getAs[Long]("s_suppkey"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal")).collect()
    val byNation = sup.groupBy(_.getInt(1))
    val expected = sup.filter { r =>
      val peers = byNation(r.getInt(1))
      cents(r.getDouble(2)) * peers.length > peers.map(p => cents(p.getDouble(2))).sum
    }.map(_.getLong(0)).sorted
    assert(got.nonEmpty && got.sameElements(expected))
  }

  test("q22: all-integer mean comparison and time-scoped anti-join agree with brute force") {
    val rows = TpchExt.q22DormantCustomers(spark, sf).collect()
    assert(rows.nonEmpty)
    val custs = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment")).collect()
    val pos = custs.map(r => cents(r.getDouble(1))).filter(_ > 0)
    val (cnt, sumC) = (custs.count(r => r.getDouble(1) > 0), pos.sum)
    val recent = Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lit(TpchExt.Q22Cutoff).cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expected = custs
      .filter(r => !recent.contains(r.getLong(0)) && cents(r.getDouble(1)) * cnt > sumC)
      .groupBy(_.getString(2)).view.mapValues(_.length)
    assert(rows.map(r => r.getString(0) -> r.getAs[Long]("numcust").toInt).toMap ==
      expected.toMap)
    val segs = rows.map(_.getString(0))
    assert(segs.sameElements(segs.sorted))
  }
}
