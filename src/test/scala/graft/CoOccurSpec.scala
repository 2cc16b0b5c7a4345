package graft

import org.apache.spark.sql.functions._
import graft.operators.{CoOccur, GraphRank}
import graft.sources.Tables

/** Skip-gram pair extraction, PMI-ratio scoring, and triangle counting
  * against independent driver-side recomputes (brute-force window scan
  * / O(V^3) triangle enumeration — different algorithms than the
  * engine's codegen pair generator and degree-oriented wedge join). */
class CoOccurSpec extends SparkSpec {

  private def docTokens(): Seq[Array[String]] =
    Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select(col("text")).collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty)).toSeq

  private def bruteForcePairs(): Map[(String, String), Long] = {
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    for (toks <- docTokens(); i <- toks.indices;
         j <- (i + 1) to math.min(i + CoOccur.Window, toks.length - 1)) {
      val k = (toks(i), toks(j))
      counts(k) = counts.getOrElse(k, 0L) + 1L
    }
    counts.toMap
  }

  test("skipgram_pairs: counts equal a brute-force window scan") {
    val expected = bruteForcePairs()
    val got = CoOccur.skipgramPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // ordering contract: (center, context) ascending
    val keys = CoOccur.skipgramPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("skipgram_pairs: a 1-token document emits nothing (sequence guard)") {
    import spark.implicits._
    val df = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val pairs = df.select(explode(CoOccur.testPairStructs(col("text"))).as("p"))
      .select(col("p.center"), col("p.context")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSeq == Seq(("a", "b")))
  }

  test("skipgram_pmi: ratio bit-equal the exact product formula; ordering pinned") {
    val expected = bruteForcePairs()
    val centerM = expected.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val contextM = expected.groupBy(_._1._2).map { case (c, m) => c -> m.values.sum }
    val tot = expected.values.sum
    val got = CoOccur.skipgramPmi(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    for ((c, x, cnt, ratio) <- got) {
      assert(cnt == expected((c, x)) && cnt >= CoOccur.PmiMinCount)
      assert(ratio == (cnt * tot).toDouble / (centerM(c) * contextM(x)).toDouble)
    }
    // every qualifying pair surfaces, ranked by ratio desc with pinned tiebreak
    assert(got.length == expected.count(_._2 >= CoOccur.PmiMinCount))
    val rank = got.map { case (c, x, _, r) => (-r, c, x) }.toSeq
    assert(rank == rank.sorted)
  }

  test("graph_triangles: counts equal an O(V^3) brute-force enumeration") {
    // independent edge derivation: the GraphRankSpec sessionization
    val gapUs = graft.GraftConf.DefaultSessionGap.toLong * 60L * 1000000L
    val raw = Tables.events(spark, sf)
      .where(col("ts").isNotNull && col("user_id").isNotNull && col("props").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val und = scala.collection.mutable.Set.empty[(Long, Long)]
    raw.groupBy(_._1).foreach { case (_, evs) =>
      evs.sortBy(e => (e._2, e._3)).sliding(2).foreach {
        case Array((_, usA, _, a), (_, usB, _, b))
            if usB - usA <= gapUs && a != b =>
          und += ((math.min(a, b), math.max(a, b)))
        case _ =>
      }
    }
    val adj = und.toSeq.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, es) => k -> es.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    for (a <- nodes; b <- nodes if a < b && adj(a)(b);
         c <- nodes if b < c && adj(a)(c) && adj(b)(c); v <- Seq(a, b, c))
      expected(v) = expected.getOrElse(v, 0L) + 1L
    val got = GraphRank.triangles(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sf0.001's transition graph is triangle-free (sf0.01, the driver
    // gate's fixture, has 107) — the equality is the contract either way
    assert(got == expected.toMap)
  }

  test("graph_triangles: wedge join enumerates known structures exactly once") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
      GraphRank.trianglesOf(
        edges.toDF("src", "dst").withColumn("w", lit(1L)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 (one direction per edge; derivation treats edges as undirected)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(run(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // triangle + pendant edge + self-loop + reverse duplicate: loops and
    // direction dropped, pendant node absent from the output
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 3L), (3L, 4L))
    assert(run(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // two triangles sharing an edge: shared endpoints count both
    val bowtie = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(run(bowtie) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // square (C4): no triangles at all
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
  }
}
