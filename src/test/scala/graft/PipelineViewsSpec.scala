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
}
