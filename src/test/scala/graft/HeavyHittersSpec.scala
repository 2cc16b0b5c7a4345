package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphRank, HeavyHitters}
import graft.sources.Tables

/** Misra–Gries two-pass heavy hitters and k-core peeling against
  * independent driver-side recomputes (a plain exact count-map for the
  * heavy set; an iterative set-peeling simulation for the core),
  * plus the structural guarantees the distributed shapes rely on:
  * the MG candidate superset property under ANY partitioning, and
  * peel-round convergence at the fixture (which is what makes the
  * fixed-round output the true k-core there). */
class HeavyHittersSpec extends SparkSpec {

  // ---------- Misra–Gries ----------

  private def bruteHeavy(items: Seq[String], k: Int): Map[String, Long] = {
    val counts = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = items.size.toLong
    counts.filter { case (_, c) => c * k > n }
  }

  test("mgCandidates: superset of true heavy hitters under any partitioning (seeded random)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      // Zipf-ish stream: item i drawn with weight ~ 1/(i+1)
      val vocab = 1 + rnd.nextInt(40)
      val n = 1 + rnd.nextInt(2000)
      val items = Seq.fill(n) {
        var i = 0
        while (i < vocab - 1 && rnd.nextDouble() > 0.4) i += 1
        s"tok$i"
      }
      val k = 1 + rnd.nextInt(12)
      val parts = 1 + rnd.nextInt(5)
      // split into `parts` partitions at random cut points; candidates
      // are the union of per-partition summaries, as in the operator
      val shuffled = rnd.shuffle(items)
      val chunks = shuffled.grouped(math.max(1, (n + parts - 1) / parts)).toSeq
      val cands = chunks.flatMap(c => HeavyHitters.mgCandidates(c.iterator, k)).toSet
      val heavy = bruteHeavy(items, k).keySet
      assert(heavy.subsetOf(cands),
        s"trial $trial: missed ${heavy -- cands} (k=$k, parts=$parts, n=$n)")
      // per-partition summary size is bounded by k
      chunks.foreach { c =>
        assert(HeavyHitters.mgCandidates(c.iterator, k).size <= k)
      }
    }
  }

  test("mgCandidates: k=1 keeps a majority element; decrement evicts zeros") {
    // strict majority survives even with a single counter
    val stream = Seq("a", "b", "a", "c", "a", "a", "d", "a")
    assert(HeavyHitters.mgCandidates(stream.iterator, 1).toSet == Set("a"))
    // alternating stream with k=1: every new item cancels the counter
    val alt = Seq("x", "y", "x", "y")
    assert(HeavyHitters.mgCandidates(alt.iterator, 1).size <= 1)
  }

  test("heavy_tokens: equals the exact count-map filter; ordering pinned") {
    val toks = Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty)).toSeq
    val expected = bruteHeavy(toks, HeavyHitters.HhK)
    val got = HeavyHitters.heavyTokens(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toMap == expected)
    assert(got.nonEmpty, "fixture threshold should sit inside the distribution")
    // cnt desc, tok asc
    assert(got.sortBy { case (t, c) => (-c, t) }.toSeq == got.toSeq)
  }

  test("heavy_brands: equals the exact count-map filter") {
    val brands = Tables.part(spark, sf)
      .where(col("p_brand").isNotNull)
      .select(col("p_brand")).collect().map(_.getString(0)).toSeq
    val expected = bruteHeavy(brands, HeavyHitters.BrandK)
    val got = HeavyHitters.heavyBrands(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("heavyOf: result invariant under repartitioning (pass 1 may differ, pass 2 may not)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val items = Seq.fill(3000)(s"t${rnd.nextInt(20)}") ++ Seq.fill(500)("whale")
    val expected = bruteHeavy(items, 10)
    for (parts <- Seq(1, 3, 16)) {
      val df = items.toDF("item").repartition(parts)
      // distinct memo key per partitioning: pass 1 must genuinely
      // re-run on each layout for the invariance claim to be tested
      val got = HeavyHitters.heavyOf(spark, df, 10, s"spec_inv_$parts").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == expected, s"parts=$parts")
    }
    assert(expected.contains("whale"))
  }

  // ---------- k-core ----------

  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    var nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSet
    def degrees(alive: Set[Long]): Map[Long, Long] =
      und.filter { case (a, b) => alive(a) && alive(b) }
        .flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    for (_ <- 1 to rounds)
      nodes = degrees(nodes).filter(_._2 >= k).keySet
    degrees(nodes)
  }

  private def kcoreOf(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphRank.kcoreOf(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kcoreOf: known structures — clique core, cascading tail, cycle, bowtie") {
    // K5 with a pendant path 5-6-7: 4-core = the K5, every degree 4
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val tail = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    assert(kcoreOf(k5 ++ tail, 4, 8) == (0L to 4L).map(_ -> 4L).toMap)
    // the same graph's 2-core: K5 only (the path cascades off one
    // node per round — rounds must cover the cascade depth)
    assert(kcoreOf(k5 ++ tail, 2, 8).keySet == (0L to 4L).toSet)
    // a pure cycle is its own 2-core
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(kcoreOf(cycle, 2, 8) == (0L to 3L).map(_ -> 2L).toMap)
    // 3-core of a cycle is empty
    assert(kcoreOf(cycle, 3, 8).isEmpty)
    // direction and duplicate edges don't matter; self-loops dropped
    val noisy = cycle ++ cycle.map { case (a, b) => (b, a) } ++ Seq((1L, 1L))
    assert(kcoreOf(noisy, 2, 8) == (0L to 3L).map(_ -> 2L).toMap)
  }

  test("kcoreOf: insufficient rounds under-peel; fixture rounds converge (fixed point)") {
    // path 0-1-2-...-9 hanging off triangle 10-11-12, k=2: the path
    // peels one node per round, so 1 round leaves most of it
    val tri = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val path = (0L until 10L).map(i => (i, i + 1)) :+ (9L, 10L)
    val oneRound = kcoreOf(tri ++ path, 2, 1)
    assert(oneRound.keySet != tri.flatMap(t => Seq(t._1, t._2)).toSet)
    val enough = kcoreOf(tri ++ path, 2, 12)
    assert(enough == Map(10L -> 2L, 11L -> 2L, 12L -> 2L))
    // driver-side simulation agrees at every round count
    for (r <- Seq(1, 3, 12))
      assert(kcoreOf(tri ++ path, 2, r) == peel(tri ++ path, 2, r))
  }

  test("graph_kcore: fixture equals driver-side peel and has converged at KCoreRounds") {
    val edges = GraphRank.itemEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = peel(edges, GraphRank.KCoreK, GraphRank.KCoreRounds)
    val got = GraphRank.kcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // fixed point: one more round changes nothing, so the registered
    // output IS the true k-core at this fixture (not a truncation)
    val more = peel(edges, GraphRank.KCoreK, GraphRank.KCoreRounds + 1)
    assert(more == expected)
    // once converged, every surviving degree clears the threshold
    assert(got.values.forall(_ >= GraphRank.KCoreK))
  }
}
