package graft

import org.apache.spark.sql.functions._
import graft.operators.{RankSetOps, RefQueries}
import graft.sources.Tables

/** Semantic checks for the ranking-window / bag set-op / pivot surface:
  * ranking identities are recomputed from the collected rows, bag
  * multiplicities from independent per-side counts, and the pivot from a
  * direct conditional aggregate. */
class RankSetOpsSpec extends SparkSpec {

  test("rank_pct: ranking identities hold within every nation") {
    // sf0.01 — the sf0.001 fixture has one supplier per nation, which
    // would make every partition the trivial n=1 case
    val rows = RankSetOps.supplierRankPct(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    assert(rows.groupBy(_.getString(0)).values.exists(_.length > 1))
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val n = g.length
      // revenue ties are peers: same revenue ⇒ same rank/pct/cume
      val byRev = g.groupBy(_.getAs[Double]("revenue"))
      byRev.values.foreach { peers =>
        assert(peers.map(_.getAs[Long]("rnk")).distinct.length == 1)
        assert(peers.map(_.getAs[Double]("cum_dist")).distinct.length == 1)
      }
      g.foreach { r =>
        val rnk = r.getAs[Long]("rnk")
        val expectedPct = if (n == 1) 0.0 else (rnk - 1).toDouble / (n - 1).toDouble
        assert(r.getAs[Double]("pct_rank") == expectedPct)
        assert(r.getAs[Long]("drnk") <= rnk)
        // cume_dist = fraction of rows with revenue >= mine
        val ge = g.count(_.getAs[Double]("revenue") >= r.getAs[Double]("revenue"))
        assert(r.getAs[Double]("cum_dist") == ge.toDouble / n.toDouble)
      }
      // dense ranks are 1..#distinct with no gaps
      val dr = g.map(_.getAs[Long]("drnk")).distinct.sorted
      assert(dr.sameElements(1L to dr.length.toLong))
    }
  }

  test("rank_pct: known ties are true peers (rank gaps, shared pct/cume, dense gapless)") {
    import spark.implicits._
    // one partition, revenues 400, 300, 300, 100 → ranks 1,2,2,4
    val rev = Seq(("N", 1L, 4000000L), ("N", 2L, 3000000L),
      ("N", 3L, 3000000L), ("N", 4L, 1000000L))
      .toDF("n_name", "s_suppkey", "rc")
    val got = RankSetOps.rankWindow(rev).collect()
      .map(r => (r.getLong(1), r.getAs[Long]("rnk"), r.getAs[Long]("drnk"),
        r.getAs[Double]("pct_rank"), r.getAs[Double]("cum_dist")))
    assert(got.sameElements(Seq(
      (1L, 1L, 1L, 0.0, 0.25),
      (2L, 2L, 2L, 1.0 / 3.0, 0.75),
      (3L, 2L, 2L, 1.0 / 3.0, 0.75),
      (4L, 4L, 3L, 1.0, 1.0))))
  }

  private def monthCounts(range: (String, String)): Map[(Long, String), Long] =
    Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit(range._1).cast("timestamp") &&
             col("l_shipdate") < lit(range._2).cast("timestamp"))
      .groupBy(col("l_suppkey"), col("l_returnflag")).count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("except_all / intersect_all: multiplicities are max(0,a-b) and min(a,b)") {
    val a = monthCounts(RankSetOps.SetOpMonthA)
    val b = monthCounts(RankSetOps.SetOpMonthB)
    val exc = RankSetOps.exceptAllShipments(spark, sf).collect()
      .groupBy(r => (r.getLong(0), r.getString(1))).view.mapValues(_.length.toLong).toMap
    val expectedExc = a.map { case (k, ca) => k -> math.max(0L, ca - b.getOrElse(k, 0L)) }
      .filter(_._2 > 0)
    assert(exc == expectedExc)
    val inter = RankSetOps.intersectAllShipments(spark, sf).collect()
      .groupBy(r => (r.getLong(0), r.getString(1))).view.mapValues(_.length.toLong).toMap
    val expectedInter = a.flatMap { case (k, ca) =>
      val m = math.min(ca, b.getOrElse(k, 0L)); if (m > 0) Some(k -> m) else None
    }
    assert(inter == expectedInter)
    assert(inter.nonEmpty && exc.nonEmpty)
  }

  test("pivot: columns are the conditional aggregates and cover the table") {
    val rows = RankSetOps.pivotPricing(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.sameElements(Array("F", "O")))
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_linestatus"), col("l_returnflag"))
      .agg(RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("rev")).toMap
    for (r <- rows; (flag, idx) <- Seq(("A", 1), ("N", 2), ("R", 3))) {
      val got = if (r.isNullAt(idx)) None else Some(r.getDouble(idx))
      assert(got == direct.get((r.getString(0), flag)))
    }
  }
}
