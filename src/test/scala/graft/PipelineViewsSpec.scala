package graft

import graft.operators.PipelineViews

class PipelineViewsSpec extends SparkSpec {

  test("every pipeline view registers and is queryable by plain SQL") {
    PipelineViews.ensure(spark, sf)
    PipelineViews.views.foreach { case (name, _) =>
      assert(spark.catalog.tableExists(name), s"view $name missing")
      // LIMIT 1 proves the plan under the view resolves and executes
      spark.sql(s"SELECT * FROM $name LIMIT 1").collect()
    }
    // idempotent: a second ensure must not throw or re-register
    PipelineViews.ensure(spark, sf)
  }

  test("SQL over a view composes: predicate on top of the near-dup pipeline") {
    PipelineViews.ensure(spark, sf)
    val all = spark.sql("SELECT * FROM graft_near_dups").count()
    val strict = spark.sql("SELECT * FROM graft_near_dups WHERE jaccard >= 0.8").count()
    assert(strict <= all)
  }

  test("ensureOne registers a single view and rejects unknown names") {
    graft.operators.Materialize.reset(spark)
    PipelineViews.ensureOne(spark, sf, "graft_dedup_exact")
    assert(spark.catalog.tableExists("graft_dedup_exact"))
    assert(spark.sql("SELECT * FROM graft_dedup_exact").count() > 0)
    intercept[IllegalArgumentException] {
      PipelineViews.ensureOne(spark, sf, "graft_nope")
    }
  }

  test("checkpoint reset invalidates views so ensure rebuilds working ones") {
    PipelineViews.ensure(spark, sf)
    val before = spark.sql("SELECT * FROM graft_near_dups").count()
    // reset frees the checkpoint blocks the registered view depends on;
    // it must cascade, or the next ensure would see a live-looking view
    // that fails at execution (the Bench -1 regression)
    graft.operators.Materialize.reset(spark)
    assert(!spark.catalog.tableExists("graft_near_dups"))
    PipelineViews.ensure(spark, sf)
    assert(spark.sql("SELECT * FROM graft_near_dups").count() == before)
  }
}
