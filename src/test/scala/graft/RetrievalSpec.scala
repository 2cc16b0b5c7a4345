package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval
import graft.sources.Tables

/** BM25 against a full driver-side recompute (exact double equality —
  * the scoring tree is designed to be bit-stable), and the delete-1
  * blocking join against brute-force edit distance over every pair. */
class RetrievalSpec extends SparkSpec {

  private def norm(s: String): Array[String] =
    s.toLowerCase.replaceAll("[^\\p{L}\\p{N}]+", " ").trim
      .split(" ").filter(_.nonEmpty)

  /** Code-point levenshtein — the unit UTF8String.levenshteinDistance
    * counts (a UTF-16 walk would count astral chars as two units). */
  private def lev(as: String, bs: String): Int = {
    val a = as.codePoints().toArray
    val b = bs.codePoints().toArray
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  test("bm25: top-10 matches a full driver-side recompute bit-exactly") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .collect { case r if !r.isNullAt(1) => r.getLong(0) -> norm(r.getString(1)) }
    val nd = docs.length.toDouble
    val tt = docs.map(_._2.length.toLong).sum.toDouble
    val avgdl = tt / nd
    val df = Retrieval.Bm25Terms.map(t =>
      t -> docs.count(_._2.contains(t)).toDouble).toMap
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toDouble
      val contribs = Retrieval.Bm25Terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None
        else Some(tf * 2.5 / (tf + 1.5 * (0.25 + 0.75 * (dl / avgdl))) *
          ((nd - df(t) + 0.5) / (df(t) + 0.5)))
      }
      if (contribs.forall(_.isEmpty)) None
      else {
        val score = contribs.map(_.getOrElse(0.0)).reduceLeft(_ + _)
        Some((id, contribs.count(_.isDefined).toLong, score))
      }
    }.sortBy { case (id, _, s) => (-s, id) }.take(Retrieval.Bm25TopK)
    val got = Retrieval.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == expected.toSeq)
  }

  test("bm25 multi-query: shared query bit-equals the single-query path; " +
      "every query serves real rows") {
    val multi = Retrieval.bm25MultiTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // query 1 IS Bm25Terms: the all-terms projection must not perturb
    // a single bit of its scores (same tf/df columns, same fold order)
    val q1 = multi.filter(_._1 == 1L).map(t => (t._2, t._3, t._4))
    val single = Retrieval.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(q1.toSeq == single.toSeq)
    // the batch genuinely fans out: every pinned query returns TopK
    // rows and at least two queries disagree on their top document
    val byQ = multi.groupBy(_._1)
    assert(byQ.keySet == Retrieval.Bm25Queries.map(_._1).toSet)
    assert(byQ.values.forall(_.length == Retrieval.Bm25TopK))
    assert(byQ.values.map(_.head._2).toSet.size > 1)
  }

  test("bm25 explode-join path bit-equals the unrolled multi-query path") {
    // different plan entirely — broadcast query frame + postings join +
    // src-sorted fold vs unrolled tf columns + fixed-order CASE sum —
    // yet every (query, doc, n_terms, score) row must match bitwise
    // (the fold-order contract: zeros interleaved vs omitted is an
    // exact IEEE identity on strictly positive contributions)
    val multi = Retrieval.bm25MultiTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val joined = Retrieval.bm25JoinTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(joined.toSeq == multi.toSeq)
  }

  test("bm25 MaxP: top-10 docs match a driver-side chunk-and-pool replay " +
      "bit-exactly") {
    val w = GraftConf.DefaultChunkSize
    val s = GraftConf.DefaultChunkStride
    // chunk derivation: RAW whitespace tokens (chunk_documents), then
    // BM25 normalization INSIDE each chunk — same two-stage tokenize
    val chunks = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .collect { case r if !r.isNullAt(1) =>
        r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty) }
      .filter(_._2.nonEmpty)
      .flatMap { case (id, t) =>
        (0 until t.length by s).zipWithIndex.map { case (start, cid) =>
          (id, cid.toLong, norm(t.slice(start, start + w).mkString(" "))) }
      }
    val nd = chunks.length.toDouble
    val tt = chunks.map(_._3.length.toLong).sum.toDouble
    val avgdl = tt / nd
    val df = Retrieval.Bm25Terms.map(t =>
      t -> chunks.count(_._3.contains(t)).toDouble).toMap
    val scored = chunks.flatMap { case (id, cid, toks) =>
      val dl = toks.length.toDouble
      val contribs = Retrieval.Bm25Terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None
        else Some(tf * 2.5 / (tf + 1.5 * (0.25 + 0.75 * (dl / avgdl))) *
          ((nd - df(t) + 0.5) / (df(t) + 0.5)))
      }
      if (contribs.forall(_.isEmpty)) None
      else Some((id, cid, contribs.count(_.isDefined).toLong,
        contribs.map(_.getOrElse(0.0)).reduceLeft(_ + _)))
    }
    val expected = scored.groupBy(_._1).values
      .map(_.minBy { case (_, cid, _, sc) => (-sc, cid) })  // MaxP argmax
      .toSeq.sortBy { case (id, _, _, sc) => (-sc, id) }
      .take(Retrieval.Bm25TopK)
      .map { case (id, cid, nt, sc) => (id, cid, nt, sc) }
    val got = Retrieval.bm25MaxP(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expected)
    // MaxP is passage-level by construction: every pooled score must be
    // >= what the same chunk stats give any OTHER chunk of that doc
    val byDoc = scored.groupBy(_._1)
    got.foreach { case (id, _, _, sc) =>
      assert(byDoc(id).forall(_._4 <= sc)) }
  }

  test("hard negatives are exactly ranks 2..K of the multi-query top-K, " +
      "with margin = positive score - score") {
    val topk = Retrieval.bm25MultiTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val byQuery = topk.groupBy(_._1).map { case (qid, rows) =>
      // top-K comes back (score DESC, doc_id ASC) per query — rank = position
      qid -> rows.map { case (_, doc, s) => (doc, s) }
    }
    val expected = byQuery.toSeq.sortBy(_._1).flatMap { case (qid, docs) =>
      val pos = docs.head._2
      docs.zipWithIndex.drop(1).map { case ((doc, s), i) =>
        (qid, doc, (i + 1).toLong, s, pos - s) }
    }
    val got = Retrieval.bm25HardNegatives(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == expected)
    // margins are non-negative and non-decreasing down each query's list
    got.groupBy(_._1).values.foreach { rows =>
      val ms = rows.sortBy(_._3).map(_._5)
      assert(ms.forall(_ >= 0.0) && (ms, ms.drop(1)).zipped.forall(_ <= _))
    }
  }

  test("fuzzy join: blocking finds EXACTLY the brute-force edit<=1 pairs") {
    val names = Tables.customer(spark, sf)
      .select("c_name").collect().map(_.getString(0)).sorted
    val brute = for {
      i <- names.indices; j <- (i + 1) until names.length
      if lev(names(i), names(j)) <= 1
    } yield (names(i), names(j), lev(names(i), names(j)).toLong)
    val got = Retrieval.fuzzyJoinCustomers(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == brute.sortBy(p => (p._1, p._2)))
    assert(brute.nonEmpty) // fixture must actually exercise the join
  }

  test("fuzzy join parts: member counts match groupBy; dist bounded") {
    val counts = Tables.part(spark, sf).groupBy("p_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Retrieval.fuzzyJoinParts(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("dist") <= 1L))
    assert(rows.forall(r => r.getAs[Long]("n_a") == counts(r.getString(0)) &&
      r.getAs[Long]("n_b") == counts(r.getString(1))))
  }

  test("streaming bm25 scorer matches batch scoring bit-exactly for ALL docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25s").toString
    java.nio.file.Files.copy(java.nio.file.Path.of(s"$sf/documents.parquet"),
      java.nio.file.Path.of(dir, "documents.parquet"))
    val idx = Retrieval.bm25Train(spark, sf)
    val q = graft.streaming.DocStream.bm25ScoreStream(
      graft.streaming.DocStream.readDocsStream(spark, dir), idx)
      .writeStream.format("memory").queryName("bm25_stream_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bm25_stream_test")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = Retrieval.bm25Scores(spark, sf)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("bm25 staleness contract: drift is exactly the stats literals; " +
      "retrain restores batch equality; rate-preserving append bounds drift") {
    import graft.operators.Retrieval
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    // corpus-doubling append: every doc re-ingested under a shifted id.
    // Term RATES are preserved exactly (avgdl = tt/nd is unchanged), so
    // tf normalization stays exact and ONLY the idf literals drift.
    val appended = docs.unionByName(
      docs.select((col("doc_id") + lit(maxId + 1)).as("doc_id"), col("text")))
    val stale = Retrieval.bm25Train(spark, sf)          // pre-append stats
    val fresh = Retrieval.bm25TrainOf(appended)         // retrained
    def served(idx: Retrieval.Bm25Index) =
      graft.streaming.DocStream.bm25ScoreStream(appended, idx)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val staleServed = served(stale)
    val freshServed = served(fresh)
    // retrain ⇒ the stateless scorer is bit-identical to the batch
    // corpus-stats scorer over the grown corpus (different plan: the
    // batch side derives stats in-query and broadcast-joins them)
    val batchFresh = Retrieval.bm25ScoresOf(appended)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(freshServed.nonEmpty && freshServed.sameElements(batchFresh))
    // staleness never changes WHICH docs match or how many terms —
    // tf/dl come from the row itself; only scores move
    assert(staleServed.map(t => (t._1, t._2)).toSeq ==
      freshServed.map(t => (t._1, t._2)).toSeq)
    // drift is real but bounded by the idf perturbation O(1/df_t):
    // under doubling, measured ≈ 0.2 % relative at the suite fixture
    // (df_t ≈ 10² docs ⇒ bound ≈ 0.5 %)
    val drifts = staleServed.zip(freshServed).map { case (s, f) =>
      math.abs(s._3 - f._3) / math.abs(f._3)
    }
    assert(drifts.max > 0.0, "doubling must move idf — a zero drift means the test is vacuous")
    assert(drifts.max < 0.005, s"doubling drift ${drifts.max} exceeds the O(1/df) bound")
  }

  test("entity resolution: components equal brute-force transitive closure") {
    val rows = Retrieval.entityResolution(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val names = rows.map(_._1)
    // brute-force union-find over ALL edit<=1 name pairs
    val parent = scala.collection.mutable.Map(names.map(n => n -> n): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- names.indices; j <- (i + 1) until names.length
         if lev(names(i), names(j)) <= 1) {
      val (a, b) = (find(names(i)), find(names(j)))
      if (a != b) parent(if (a < b) b else a) = if (a < b) a else b
    }
    // canonical = lexicographic min of each component
    val canon: Map[String, String] = names.groupBy(find).toSeq.flatMap {
      case (_, g) => val m = g.min; g.map(_ -> m)
    }.toMap
    assert(rows.forall { case (n, ent, size) =>
      ent == canon(n) && size == canon.values.count(_ == canon(n))
    })
    assert(rows.exists(_._3 > 1)) // fixture must contain a real merge
  }

  test("ed1 kernel equals capped levenshtein on exhaustive short strings") {
    // exhaustive over a mixed ASCII/BMP-multibyte/astral alphabet,
    // lengths 0..3: covers equal/sub/insert/delete, repeated chars,
    // the non-ASCII fallback, and supplementary-plane code points
    // (surrogate PAIRS in UTF-16 — one code point each; a UTF-16 walk
    // would disagree with levenshtein here, ADVICE r12)
    val alphabet = Seq("a", "b", "Å", "𝕏") // 𝕏 U+1D54F
    val strings = (0 to 3).flatMap(n =>
      Seq.fill(n)(alphabet).foldLeft(Seq(""))((acc, cs) =>
        acc.flatMap(s => cs.map(c => s + c))))
    for (a <- strings; b <- strings) {
      val expected = lev(a, b) match { case 0 => 0; case 1 => 1; case _ => -1 }
      val got = graft.functions.EditWithin1.dist(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == expected, s"ed1('$a','$b') = $got, want $expected")
    }
    // the exact ADVICE shape: one astral char vs empty string is
    // distance 1 (one code point), not 2
    assert(graft.functions.EditWithin1.dist(
      org.apache.spark.unsafe.types.UTF8String.fromString("𝕏"),
      org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8) == 1)
  }

  test("streaming variant emitter matches the batch projection exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fvar").toString
    java.nio.file.Files.copy(java.nio.file.Path.of(s"$sf/customer.parquet"),
      java.nio.file.Path.of(dir, "customer.parquet"))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", LongType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .select(col("c_name").as("name"))
    val q = Retrieval.variantRows(stream)
      .writeStream.format("memory").queryName("fuzzy_variant_stream_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("fuzzy_variant_stream_test")
      .orderBy("name", "v").collect().map(r => (r.getString(0), r.getString(1)))
    val batch = Retrieval.variantRows(
      Tables.customer(spark, sf).select(col("c_name").as("name")))
      .orderBy("name", "v").collect().map(r => (r.getString(0), r.getString(1)))
    assert(streamed.nonEmpty && streamed.sameElements(batch))
    // ... and the FULL loop (the architecture end-to-end): the
    // periodic-batch blocking join over the stream-accumulated variant
    // store reproduces the one-shot fuzzy join exactly. The store is
    // distinct()ed first — the documented contract for append
    // accumulation (re-ingested keys would multiply their buckets).
    val looped = Retrieval.fuzzyPairsFromVariants(
        spark.table("fuzzy_variant_stream_test").distinct())
      .select("name_a", "name_b", "dist")
      .orderBy("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val oneShot = Retrieval.fuzzyJoinCustomers(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(looped.nonEmpty && looped.sameElements(oneShot))
  }

  test("fuzzy join plan: blocking equality join, never a cartesian") {
    val plan = Retrieval.fuzzyJoinCustomers(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
