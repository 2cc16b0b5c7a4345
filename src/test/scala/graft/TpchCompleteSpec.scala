package graft

import org.apache.spark.sql.functions._
import graft.operators.{TpchComplete => T}
import graft.sources.Tables

/** Semantic cross-checks for the q8/q9/q11/q13/q15/q17/q20/q21 analogs
  * completing the TPC-H sweep: each result is recomputed through an
  * independent driver-side brute-force formulation, and the join shapes
  * the scaladocs promise (outer/semi/anti) are pinned on the plan.
  * sf0.01 where sf0.001 would make a check vacuous (empty results). */
class TpchCompleteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def cents(d: Double): Long = math.round(d * 100)

  test("q8: shares sit in [0,1] and match the brute-force conditional ratio") {
    val rows = T.q8MarketShare(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val s = r.getAs[Double]("mkt_share"); s >= 0.0 && s <= 1.0
    })
    // brute force one year end-to-end
    val y = rows.head.getAs[Long]("o_year")
    val joined = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).where(col("p_type") === T.Q8Type),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
          .where(col("o_orderdate") >= lit(T.Q8Start).cast("timestamp") &&
                 col("o_orderdate") < lit(T.Q8End).cast("timestamp") &&
                 year(col("o_orderdate")) === y.toInt),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir).withColumnRenamed("n_name", "cn_name"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).where(col("r_name") === T.Q8Region),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, dir).select(
          col("n_nationkey").as("sn_key"), col("n_name").as("sn_name")),
        col("s_nationkey") === col("sn_key"))
      .select(col("sn_name"), col("l_extendedprice"), col("l_discount")).collect()
    val terms = joined.map { r =>
      val t = BigInt(cents(r.getDouble(1))) * BigInt(100 - cents(r.getDouble(2)))
      (if (r.getString(0) == T.Q8Nation) t else BigInt(0), t)
    }
    val expected = terms.map(_._1).sum.toDouble / terms.map(_._2).sum.toDouble
    assert(rows.head.getAs[Double]("mkt_share") == expected)
  }

  test("q9: one (nation, year) group matches driver-side exact profit") {
    val rows = T.q9ProductProfit(spark, dir).collect()
    assert(rows.nonEmpty)
    val r0 = rows.head
    val (nation, yr) = (r0.getString(0), r0.getAs[Long]("o_year"))
    val got = r0.getAs[Double]("sum_profit")
    val joined = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).where(col("p_name").contains(T.Q9NameSubstring)),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, dir).where(col("n_name") === nation),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir).where(year(col("o_orderdate")) === yr.toInt),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_extendedprice"), col("l_discount"), col("p_retailprice"),
        col("l_quantity")).collect()
    val exact = joined.map { r =>
      BigInt(cents(r.getDouble(0))) * BigInt(100 - cents(r.getDouble(1))) -
        BigInt(cents(r.getDouble(2))) * BigInt(r.getDouble(3).toLong) * 100
    }.sum
    assert(got == exact.toDouble / 10000.0)
  }

  test("q11: exactly the parts beating the fractional threshold, ordered by value") {
    val rows = T.q11ImportantParts(spark, dir).collect()
    assert(rows.nonEmpty)
    val nationSupp = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).where(col("n_name") === T.Q11Nation),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val byPart = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount")).collect()
      .filter(r => nationSupp.contains(r.getLong(1)))
      .groupBy(_.getLong(0)).view.mapValues(_.map(r =>
        BigInt(cents(r.getDouble(2))) * BigInt(100 - cents(r.getDouble(3)))).sum)
      .toMap
    val total = byPart.values.sum
    val expected = byPart.filter { case (_, v) => v * T.Q11FracInv > total }
      .keySet
    assert(rows.map(_.getAs[Long]("l_partkey")).toSet == expected)
    val vals = rows.map(_.getAs[Double]("value"))
    assert(vals.sameElements(vals.sorted(Ordering[Double].reverse)))
  }

  test("q13: zero-order customers are counted (outer-join filter placement)") {
    val df = T.q13OrderDistribution(spark, dir)
    assert(df.queryExecution.executedPlan.toString.contains("LeftOuter"))
    val rows = df.collect()
    // every customer lands in exactly one bucket
    assert(rows.map(_.getAs[Long]("custdist")).sum ==
      Tables.customer(spark, dir).count())
    // Σ c_count·custdist = non-excluded orders of known customers
    val orderTotal = Tables.orders(spark, dir)
      .where(col("o_orderpriority") =!= T.Q13ExcludePriority)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"),
        "left_semi").count()
    assert(rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
      == orderTotal)
  }

  test("q15: the winners carry exactly the maximum quarterly revenue") {
    val rows = T.q15TopSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
    val perSupp = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit(T.Q15Start).cast("timestamp") &&
             col("l_shipdate") < lit(T.Q15End).cast("timestamp"))
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(r =>
        BigInt(cents(r.getDouble(1))) * BigInt(100 - cents(r.getDouble(2)))).sum)
      .toMap
    val maxRev = perSupp.values.max
    val expected = perSupp.filter(_._2 == maxRev).keySet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == expected)
    assert(rows.forall(_.getAs[Double]("total_revenue") == maxRev.toDouble / 10000.0))
  }

  test("q17: integer rewrite selects exactly qty < 0.2·avg(part) and sums exactly") {
    val got = T.q17SmallQtyRevenue(spark, dir).collect()(0).getAs[Double]("avg_yearly")
    val smallParts = Tables.part(spark, dir).where(col("p_type") === T.Q17Type)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().filter(r => smallParts.contains(r.getLong(0)))
    val stats = li.groupBy(_.getLong(0)).view
      .mapValues(rs => (rs.length.toLong, rs.map(_.getDouble(1).toLong).sum)).toMap
    val kept = li.filter { r =>
      val (n, sumQ) = stats(r.getLong(0))
      // the rational predicate itself, not the rewrite under test
      BigDecimal(r.getDouble(1)) < BigDecimal(sumQ) / BigDecimal(5 * n)
    }
    val exact = kept.map(r => BigInt(cents(r.getDouble(2)))).sum
    assert(got == exact.toDouble / 700.0 && got > 0)
  }

  test("q20: semi-join chain keeps exactly suppliers with a qualifying pair") {
    val df = T.q20PromotionSuppliers(spark, dir)
    assert(df.queryExecution.executedPlan.toString.contains("LeftSemi"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val redParts = Tables.part(spark, dir)
      .where(col("p_name").startsWith(T.Q20Prefix))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val expected = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit(s"${T.Q20Year}-01-01").cast("timestamp") &&
             col("l_shipdate") < lit(s"${T.Q20Year + 1}-01-01").cast("timestamp"))
      .select(col("l_suppkey"), col("l_partkey"), col("l_quantity")).collect()
      .filter(r => redParts.contains(r.getLong(1)))
      .groupBy(r => (r.getLong(0), r.getLong(1))).view
      .mapValues(_.map(_.getDouble(2).toLong).sum)
      .filter(_._2 > T.Q20MinQty).keys.map(_._1).toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == expected)
  }

  test("q21: only-returner semantics match brute force; semi AND anti in the plan") {
    val df = T.q21WaitingSuppliers(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val finished = Tables.orders(spark, dir).where(col("o_orderstatus") === "F")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val nationSupp = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).where(col("n_name") === T.Q21Nation),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag")).collect()
    val suppsByOrder = li.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val returnersByOrder = li.filter(_.getString(2) == "R").groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val counts = li.filter { r =>
      val (ok, sk) = (r.getLong(0), r.getLong(1))
      r.getString(2) == "R" && finished.contains(ok) &&
        nationSupp.contains(sk) &&
        suppsByOrder(ok).exists(_ != sk) &&
        !returnersByOrder(ok).exists(_ != sk)
    }.groupBy(r => nationSupp(r.getLong(1))).view.mapValues(_.length.toLong).toMap
    val k = GraftConf.topK(spark)
    val expected = counts.toSeq.sortBy { case (n, c) => (-c, n) }.take(k)
    assert(rows.map(r => (r.getString(0), r.getAs[Long]("numwait"))).toSeq
      == expected)
  }
}
