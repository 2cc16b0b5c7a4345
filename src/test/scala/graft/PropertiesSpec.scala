package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** The two properties SURVEY.md §5 commits to: top-K == full-sort-take(k)
  * and group-by-sum invariance under repartitioning. Run on seeded
  * random data, not fixtures, so they pin the operator semantics
  * themselves. (Plain seeded generators — the scalatest/scalacheck
  * bridge artifact isn't in the offline cache.)
  */
class PropertiesSpec extends SparkSpec {

  private def randomRows(rng: Random): List[(Long, Long)] =
    List.fill(1 + rng.nextInt(200))((rng.nextLong(21), rng.nextLong(2001) - 1000))

  test("top-K by aggregated measure equals full sort + take(k)") {
    import spark.implicits._
    val rng = new Random(42)
    for (_ <- 1 to 15) {
      val rows = randomRows(rng)
      val k = 1 + rng.nextInt(8)
      val agg = rows.toDF("key", "v").groupBy("key").agg(sum("v").as("s"))
      val topK = agg.orderBy(col("s").desc, col("key").asc).limit(k)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val full = agg.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy { case (key, s) => (-s, key) }.take(k)
      assert(topK.sameElements(full), s"k=$k rows=${rows.take(5)}...")
    }
  }

  test("group-by sum is invariant under repartitioning") {
    import spark.implicits._
    val rng = new Random(7)
    for (parts <- Seq(1, 3, 7)) {
      val rows = randomRows(rng)
      val df = rows.toDF("key", "v")
      val base = df.groupBy("key").agg(sum("v")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val rep = df.repartition(parts).groupBy("key").agg(sum("v")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(base.sameElements(rep), s"parts=$parts")
    }
  }
}
