package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import graft.plans.NoCartesianGuard

/** The planning-time cartesian guard: default-off no-op, and when armed
  * it kills exactly the runaway shapes (no-equi-key inner/cross with
  * both sides over the broadcast threshold) while the library's own
  * scalar-broadcast pattern and ordinary equi-joins stay legal. */
class GuardSpec extends SparkSpec {

  private def arm(on: Boolean): Unit =
    spark.conf.set(GraftConf.NoCartesianGuardKey, on.toString)

  test("guard: default off — a big cartesian still optimizes") {
    NoCartesianGuard.install(spark)
    val a = spark.range(10000000L).toDF("x")
    val b = spark.range(10000000L).toDF("y")
    a.crossJoin(b).queryExecution.optimizedPlan // must not throw
  }

  test("guard armed with broadcasting DISABLED (-1): scalar cross still legal, big still dies") {
    NoCartesianGuard.install(spark)
    arm(true)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(10000000L).toDF("x")
      val b = spark.range(10000000L).toDF("y")
      // -1 must not turn 'size > threshold' vacuously true: the 1-row
      // scalar pattern stays legal under the guard's internal floor
      a.crossJoin(b.agg(count(lit(1)).as("n"))).queryExecution.optimizedPlan
      intercept[SparkException] {
        a.crossJoin(b).queryExecution.optimizedPlan
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      arm(false)
    }
  }

  test("guard armed: big no-key cartesians die at plan time; legal shapes pass") {
    NoCartesianGuard.install(spark)
    arm(true)
    try {
      val a = spark.range(10000000L).toDF("x")
      val b = spark.range(10000000L).toDF("y")
      val ex = intercept[SparkException] {
        a.crossJoin(b).queryExecution.optimizedPlan
      }
      assert(ex.getMessage.contains(GraftConf.NoCartesianGuardKey))
      // a non-equi inner join is the same cartesian in disguise
      intercept[SparkException] {
        a.join(b, col("x") < col("y")).queryExecution.optimizedPlan
      }
      // equi-join (plus residual range conjunct) is legal
      a.join(b, col("x") === col("y") && col("x") < col("y") + 5)
        .queryExecution.optimizedPlan
      // the library's scalar-broadcast pattern is legal (build side is
      // a 1-row aggregate, far under the threshold)
      a.crossJoin(b.agg(count(lit(1)).as("n"))).queryExecution.optimizedPlan
      // and a registered query built on that pattern runs end-to-end
      assert(SparkEntry.queries("q22_dormant_customers")(spark, sf)
        .collect().nonEmpty)
    } finally arm(false)
  }

  test("guard armed: an explicit broadcast() hint exempts a filter-estimated side") {
    NoCartesianGuard.install(spark)
    arm(true)
    try {
      // the sf10 similarity shape: the query side is ONE real row, but
      // a Filter keeps its child's sizeInBytes without CBO stats, so
      // both sides estimate over the threshold and the unhinted cross
      // join dies...
      val big = spark.range(10000000L).toDF("x")
      val oneRow = big.where(col("x") === 42L)
      intercept[SparkException] {
        big.crossJoin(oneRow).queryExecution.optimizedPlan
      }
      // ...while broadcast() is a deliberate smallness assertion that
      // exempts the join — the brute-force top-K pattern stays legal
      // at ANY corpus size
      big.crossJoin(broadcast(oneRow)).queryExecution.optimizedPlan
    } finally arm(false)
  }
}
