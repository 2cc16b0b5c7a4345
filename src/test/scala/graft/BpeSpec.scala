package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.sources.Tables

/** BPE training/encode against an independent driver-side replay —
  * list-of-symbols merge application (scan-and-merge over token
  * vectors), a different algorithm than the engine's wrapped-string
  * `replace` representation. */
class BpeSpec extends SparkSpec {

  /** Reference implementation: greedy BPE over a (word -> count) map
    * using symbol VECTORS, leftmost-first non-overlapping merges. */
  private def refBpe(wc: Map[String, Long], n: Int): (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    var segs: Map[String, Vector[String]] = wc.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= n && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- segs; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + wc(w)
      }
      if (counts.isEmpty) exhausted = true // pinned early stop
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        learned += ((step, a, b, c))
        segs = segs.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2 // leftmost-first, non-overlapping
            } else { out += syms(i); i += 1 }
          }
          w -> out.result()
        }
        step += 1
      }
    }
    (learned.result(), segs)
  }

  private def fixtureWordCounts(): Map[String, Long] =
    Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }

  test("bpe_merges: learned rules equal the vector-replay reference on the fixture") {
    val (expected, _) = refBpe(fixtureWordCounts(), Bpe.Merges)
    val got = Bpe.merges(spark, sf).collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("bpe_vocab: symbol occurrences equal the reference final segmentation") {
    val wc = fixtureWordCounts()
    val (_, segs) = refBpe(wc, Bpe.Merges)
    val expected = segs.toSeq
      .flatMap { case (w, syms) => syms.map(_ -> wc(w)) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val got = Bpe.vocab(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // total symbol mass only shrinks vs characters (each merge joins two)
    val charMass = wc.map { case (w, c) => w.length * c }.sum
    assert(got.values.sum <= charMass)
  }

  test("bpe_encode: per-doc token counts equal reference retokenization") {
    val wc = fixtureWordCounts()
    val (_, segs) = refBpe(wc, Bpe.Merges)
    val docs = Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val expected = docs.map { case (id, ws) =>
      (id, ws.length.toLong, ws.map(w => segs(w).length.toLong).sum)
    }.sortBy(_._1).toSeq
    val got = Bpe.encode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("bpe_token_ids: sequences equal reference segmentation under symbol-asc dense ids") {
    val wc = fixtureWordCounts()
    val (_, segs) = refBpe(wc, Bpe.Merges)
    val symId = segs.values.flatten.toSeq.distinct.sorted
      .zipWithIndex.map { case (s, i) => s -> (i + 1).toLong }.toMap
    val docs = Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val expected = docs.map { case (id, ws) =>
      id -> ws.flatMap(w => segs(w).map(symId)).toSeq
    }.toMap
    val got = Bpe.tokenIdsFrame(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    assert(got.map(_._1) == got.map(_._1).sorted)
    for ((id, n, ids) <- got) {
      assert(ids == expected(id), s"doc $id")
      assert(n == ids.length.toLong)
    }
    assert(got.map(_._1).toSet == expected.keySet)
    // the REGISTERED surface canonicalizes ids to a space-joined string
    // (driver-gate shape: pandas-sortable scalar columns only)
    val reg = Bpe.tokenIds(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    for ((id, n, ids) <- got) assert(reg(id) == ids.mkString(" "))
  }

  test("bpe_decode round-trips ids to the original tokens concatenated") {
    val docs = Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .filter(_._2.nonEmpty).toMap
    val got = Bpe.decode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.keySet == docs.keySet)
    for ((id, ws) <- docs) assert(got(id) == ws.mkString(""), s"doc $id")
  }

  test("trainLoopLocal equals the distributed trainLoop on the fixture vocabulary") {
    import spark.implicits._
    val wc = fixtureWordCounts()
    val (dist, distV) = Bpe.trainLoop(wc.toSeq.toDF("word", "cnt"), Bpe.Merges)
    val (local, localV) = Bpe.trainLoopLocal(wc.toSeq, Bpe.Merges)
    assert(local == dist)
    // final segmentation states agree too (the encode-serving table)
    val distSegs = distV.collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(localV.map { case (w, _, q) => w -> q }.toMap == distSegs)
  }

  test("bpe_merges_scaled: 256 rules equal the vector-replay reference over top-capped c_names") {
    val wc = Tables.customer(spark, sf)
      .where(col("c_name").isNotNull)
      .select(col("c_name")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val capped = wc.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(Bpe.TopWordTypes).toMap
    val (expected, _) = refBpe(capped, Bpe.ScaledMerges)
    val got = Bpe.mergesScaled(spark, sf).collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // sf0.001's 150 shared-prefix names exhaust before 256 rules — the
    // pinned early stop; the reference must land on the same step
    assert(got == expected && got.length > Bpe.Merges)
  }

  test("bpe_encode_scaled: counts equal reference retokenization under the capped scaled vocab") {
    val wc = Tables.customer(spark, sf)
      .where(col("c_name").isNotNull)
      .select(col("c_name")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val capped = wc.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(Bpe.TopWordTypes).toMap
    val (_, segs) = refBpe(capped, Bpe.ScaledMerges)
    val custs = Tables.customer(spark, sf)
      .where(col("c_name").isNotNull)
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val expected = custs.flatMap { case (k, ws) =>
      val inVocab = ws.filter(segs.contains)
      if (inVocab.isEmpty) None // inner-join semantics: untrained words drop
      else Some((k, inVocab.length.toLong, inVocab.map(w => segs(w).length.toLong).sum))
    }.sortBy(_._1).toSeq
    val got = Bpe.encodeScaled(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("bpe_merges_scaled_docs: docs-trained rules equal the vector-replay reference (exhaustion stop)") {
    val wc = fixtureWordCounts()
    val capped = wc.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(Bpe.TopWordTypes).toMap
    val (expected, _) = refBpe(capped, Bpe.ScaledMerges)
    val got = Bpe.mergesScaledDocs(spark, sf).collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // the fixture documents vocabulary is small: training exhausts
    // before ScaledMerges and the reference must stop at the same step
    assert(got == expected && got.length < Bpe.ScaledMerges && got.nonEmpty)
  }

  test("bpe_token_ids_scaled: sequences equal reference segmentation under the docs-scaled vocab") {
    val wc = fixtureWordCounts()
    val capped = wc.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(Bpe.TopWordTypes).toMap
    val (_, segs) = refBpe(capped, Bpe.ScaledMerges)
    val symId = segs.values.flatten.toSeq.distinct.sorted
      .zipWithIndex.map { case (s, i) => s -> (i + 1).toLong }.toMap
    val docs = Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val expected = docs.flatMap { case (id, ws) =>
      val inVocab = ws.filter(segs.contains)
      if (inVocab.isEmpty) None // inner-join semantics
      else Some(id -> inVocab.flatMap(w => segs(w).map(symId)).toSeq)
    }.toMap
    val got = Bpe.tokenIdsScaledFrame(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    assert(got.map(_._1).toSet == expected.keySet)
    for ((id, n, ids) <- got) {
      assert(ids == expected(id), s"doc $id")
      assert(n == ids.length.toLong)
    }
  }

  test("bpe_decode_scaled round-trips docs-scaled ids to in-vocab tokens concatenated") {
    val wc = fixtureWordCounts()
    val capped = wc.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(Bpe.TopWordTypes).toMap.keySet
    val docs = Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).filter(capped))
      .filter(_._2.nonEmpty).toMap
    val got = Bpe.decodeScaled(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.keySet == docs.keySet)
    for ((id, ws) <- docs) assert(got(id) == ws.mkString(""), s"doc $id")
  }

  test("pack_from_bpe_scaled conserves the docs-scaled token mass") {
    val wc = fixtureWordCounts()
    val capped = wc.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(Bpe.TopWordTypes).toMap
    val (_, segs) = refBpe(capped, Bpe.ScaledMerges)
    val docs = Tables.documents(spark, sf)
      .where(col("text").isNotNull)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val totalToks = docs.filter(segs.contains).map(w => segs(w).length.toLong).sum
    val packed = Bpe.packFromBpeScaled(spark, sf).collect()
    assert(packed.map(_.getLong(4)).sum == totalToks && packed.nonEmpty)
    val byCell = packed.groupBy(r => (r.getString(0), r.getLong(1)))
    for ((_, rows) <- byCell) {
      val ids = rows.map(_.getLong(2)).toSeq
      assert(ids.min == 0L && ids.distinct == ids)
    }
  }

  test("pack_from_bpe round-trips the encode token counts into sequences") {
    val packed = Bpe.packFromBpe(spark, sf).collect()
    val encoded = Bpe.encode(spark, sf).collect()
    assert(packed.map(_.getLong(4)).sum == encoded.map(_.getLong(2)).sum)
    assert(packed.nonEmpty)
    // within each (lang, shard), the first doc's first token is always
    // in chunk 0, and chunk ids are distinct
    val byCell = packed.groupBy(r => (r.getString(0), r.getLong(1)))
    for ((_, rows) <- byCell) {
      val ids = rows.map(_.getLong(2)).toSeq
      assert(ids.min == 0L && ids.distinct == ids)
    }
  }

  test("merge application is leftmost-first non-overlapping (aaaa/aaa shapes)") {
    import spark.implicits._
    val wc = Seq(("aaaa", 10L), ("aaa", 7L), ("ab", 1L)).toDF("word", "cnt")
    // pair (a,a): aaaa has 3 adjacent occurrences but only 2 disjoint;
    // counting is positional (3*10 + 2*7 = 44), application is disjoint.
    val (learned, v) = Bpe.trainLoop(wc, 1)
    assert(learned.head._2 == "a" && learned.head._3 == "a" && learned.head._4 == 44L)
    val segs = v.collect().map(r => r.getString(0) ->
      r.getString(2).stripPrefix("·").stripSuffix("·").split("··").toSeq).toMap
    assert(segs("aaaa") == Seq("aa", "aa"))
    assert(segs("aaa") == Seq("aa", "a"))
    assert(segs("ab") == Seq("a", "b"))
  }

  test("tiebreaks are (count desc, lhs asc, rhs asc)") {
    import spark.implicits._
    // abba: pairs (a,b), (b,b), (b,a) each occur once -> (a,b) wins on lhs asc
    val wc = Seq(("abba", 1L)).toDF("word", "cnt")
    val (learned, _) = Bpe.trainLoop(wc, 1)
    assert((learned.head._2, learned.head._3) == ("a", "b"))
    // bbba: (b,b) x2 beats (b,a) x1 on count before any tiebreak
    val wc2 = Seq(("bbba", 1L)).toDF("word", "cnt")
    val (learned2, v2) = Bpe.trainLoop(wc2, 1)
    assert((learned2.head._2, learned2.head._3, learned2.head._4) == ("b", "b", 2L))
    val seg2 = v2.collect().head.getString(2)
    assert(seg2 == "·bb··b··a·")
  }
}
