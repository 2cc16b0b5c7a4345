package graft

import org.apache.spark.sql.functions._
import graft.operators.{ProductQuant, Similarity}
import graft.sources.Tables

/** PQ training + serving against a full driver-side replay in plain
  * Scala (independent of both the Spark expressions and the DuckDB
  * oracle), exact double equality on the scores. */
class ProductQuantSpec extends SparkSpec {
  import ProductQuant.{PqIters, PqK, PqM, SubDim}

  private def quant(e: Seq[Double]): IndexedSeq[Long] =
    e.map(x => java.math.BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).toIndexedSeq

  private def corpusLocal(): IndexedSeq[(Long, Any, IndexedSeq[Long])] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.get(1), quant(r.getSeq[Double](2))))
      .sortBy(_._1).toIndexedSeq

  private def dot(a: Seq[Long], b: Seq[Long]): Long =
    a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum

  /** Replay of pqTrainOver at an arbitrary geometry: returns codebooks
    * (cid → sub-dim code). cids are init RANKS (1..k), matching the
    * engine's rank-cid rule. */
  private def trainLocalAt(corpus: IndexedSeq[(Long, Any, IndexedSeq[Long])],
      m: Int, sub: Int, k: Int, iters: Int)
      : IndexedSeq[IndexedSeq[(Long, IndexedSeq[Long])]] = {
    val init = corpus.filter(_._1 >= 1).sortBy(_._1).take(k)
    var books = IndexedSeq.tabulate(m) { s =>
      init.zipWithIndex.map { case (c, idx) =>
        (idx + 1L) -> c._3.slice(s * sub, s * sub + sub)
      }
    }
    def assign(book: Seq[(Long, IndexedSeq[Long])], q: Seq[Long]): Long = {
      val n2 = dot(q, q)
      book.map { case (cid, cq) =>
        (n2 - 2 * dot(q, cq) + dot(cq, cq), cid)
      }.min._2
    }
    for (_ <- 1 to iters) {
      books = books.zipWithIndex.map { case (book, s) =>
        val groups = corpus.groupBy(c =>
          assign(book, c._3.slice(s * sub, s * sub + sub)))
        book.map { case (cid, cq) =>
          groups.get(cid) match {
            case Some(g) if g.nonEmpty =>
              val mq = IndexedSeq.tabulate(sub) { j =>
                val sum = g.map(_._3(s * sub + j)).sum
                java.math.BigDecimal.valueOf(sum.toDouble / g.size)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
              }
              cid -> mq
            case _ => cid -> cq
          }
        }
      }
    }
    books
  }

  private def trainLocal(corpus: IndexedSeq[(Long, Any, IndexedSeq[Long])])
      : IndexedSeq[IndexedSeq[(Long, IndexedSeq[Long])]] =
    trainLocalAt(corpus, PqM, SubDim, PqK, PqIters)

  test("pq training matches the driver-side replay code for code") {
    val books = ProductQuant.pqTrain(spark, sf)
    val local = trainLocal(corpusLocal())
    for (s <- 0 until PqM) {
      val got = books(s).sortBy(_.cid).map(c => c.cid -> c.cq.toIndexedSeq)
      assert(got == local(s), s"subspace $s codebooks differ")
    }
  }

  test("pq top-K scores match the full local replay bit-exactly") {
    val corpus = corpusLocal()
    val local = trainLocal(corpus)
    def assign(book: Seq[(Long, IndexedSeq[Long])], q: Seq[Long]): IndexedSeq[Long] = {
      val n2 = dot(q, q)
      book.map { case (cid, cq) => (n2 - 2 * dot(q, cq) + dot(cq, cq), cid) }
        .min._2 +: IndexedSeq.empty[Long]
    }
    val qrow = corpus.find(_._1 == Similarity.QueryVecId).get
    val qq = qrow._3
    val qn2 = dot(qq, qq)
    val expected = corpus.filter(_._1 != Similarity.QueryVecId).map { c =>
      val rq = (0 until PqM).flatMap { s =>
        val sl = c._3.slice(s * SubDim, s * SubDim + SubDim)
        val cid = assign(local(s), sl).head
        local(s).find(_._1 == cid).get._2
      }
      val cos = dot(rq, qq).toDouble /
        (math.sqrt(dot(rq, rq).toDouble) * math.sqrt(qn2.toDouble))
      (c._1, c._2, cos)
    }.sortBy { case (id, _, cos) => (-cos, id) }.take(Similarity.TopK)
    val got = ProductQuant.pqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.get(1), r.getDouble(2)))
    assert(got.toSeq == expected)
    assert(got.forall(r => math.abs(r._3) <= 1.0000001))
  }

  test("ivf-pq: scores equal the PQ replay for every returned candidate") {
    val corpus = corpusLocal()
    val local = trainLocal(corpus)
    val qq = corpus.find(_._1 == Similarity.QueryVecId).get._3
    val qn2 = dot(qq, qq)
    def pqCos(q: IndexedSeq[Long]): Double = {
      val rq = (0 until PqM).flatMap { s =>
        val sl = q.slice(s * SubDim, s * SubDim + SubDim)
        val n2 = dot(sl, sl)
        val cid = local(s).map { case (c, cq) =>
          (n2 - 2 * dot(sl, cq) + dot(cq, cq), c)
        }.min._2
        local(s).find(_._1 == cid).get._2
      }
      dot(rq, qq).toDouble /
        (math.sqrt(dot(rq, rq).toDouble) * math.sqrt(qn2.toDouble))
    }
    val rows = ProductQuant.ivfPqTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    val byId = corpus.map(c => c._1 -> c._3).toMap
    rows.foreach { r =>
      assert(r.getDouble(3) == pqCos(byId(r.getLong(0))),
        s"score mismatch for vec ${r.getLong(0)}")
    }
    // strictly fewer candidates than the corpus are eligible (probed
    // cells prune), yet the serving contract still returns TopK rows
    assert(rows.length == Similarity.TopK)
  }

  test("pq_codes_small: probe-geometry codes and norms match the local replay") {
    import ProductQuant.{SmallIters, SmallK, SmallM, SmallSub}
    val corpus = corpusLocal()
    // fixture scale: stride = 1, so the pinned sample IS the corpus
    assert(Similarity.trainSampleStride(corpus.length.toLong, ProductQuant.PqK) == 1L)
    val local = trainLocalAt(corpus, SmallM, SmallSub, SmallK, SmallIters)
    def assign(book: Seq[(Long, IndexedSeq[Long])], q: Seq[Long]): Long = {
      val n2 = dot(q, q)
      book.map { case (cid, cq) => (n2 - 2 * dot(q, cq) + dot(cq, cq), cid) }.min._2
    }
    val expected = corpus.map { c =>
      val codes = (0 until SmallM).map { s =>
        assign(local(s), c._3.slice(s * SmallSub, s * SmallSub + SmallSub))
      }
      val rq = codes.zipWithIndex.flatMap { case (cid, s) =>
        local(s).find(_._1 == cid).get._2
      }
      (c._1, codes, dot(rq, rq))
    }.sortBy(_._1)
    val got = ProductQuant.pqCodesSmall(spark, sf).collect()
      .map(r => (r.getLong(0),
        (0 until SmallM).map(i => r.getLong(1 + i)),
        r.getLong(1 + SmallM))).toIndexedSeq
    assert(got == expected && got.nonEmpty)
  }

  test("residual ivf-pq: scores equal a local residual replay, and residual codes reconstruct no worse than raw") {
    val corpus = corpusLocal()
    // coarse quantizer as the engine trained it (its own oracle pins the
    // values); the test independently replays everything DOWNSTREAM of
    // it: cell assignment, residual subtraction, residual codebook
    // training, encode, centroid re-addition, serving scores
    val cents = Similarity.trainedCentroids(spark, sf)
      .select(col("cid"), col("cq")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).sortBy(_._1)
    def cellOf(q: IndexedSeq[Long]): Long = {
      val n2 = dot(q, q)
      cents.map { case (cid, cq) => (n2 - 2 * dot(q, cq) + dot(cq, cq), cid) }.min._2
    }
    val centMap = cents.toMap
    val resid = corpus.map { case (id, label, q) =>
      val cq = centMap(cellOf(q))
      (id, label, q.indices.map(i => q(i) - cq(i)).toIndexedSeq)
    }
    val localResid = trainLocal(resid)
    val localRaw = trainLocal(corpus)
    def reconFrom(books: IndexedSeq[IndexedSeq[(Long, IndexedSeq[Long])]],
        v: IndexedSeq[Long]): IndexedSeq[Long] =
      (0 until PqM).flatMap { s =>
        val sl = v.slice(s * SubDim, s * SubDim + SubDim)
        val n2 = dot(sl, sl)
        val cid = books(s).map { case (c, cq) =>
          (n2 - 2 * dot(sl, cq) + dot(cq, cq), c) }.min._2
        books(s).find(_._1 == cid).get._2
      }.toIndexedSeq
    val qq = corpus.find(_._1 == Similarity.QueryVecId).get._3
    val qn2 = dot(qq, qq)
    val residById = resid.map(c => (c._1, c._3)).toMap
    val rawById = corpus.map(c => (c._1, c._3)).toMap
    def residCos(id: Long): Double = {
      val rv = residById(id)
      val cq = centMap(cellOf(rawById(id)))
      val rr = reconFrom(localResid, rv)
      val rq = rr.indices.map(i => cq(i) + rr(i)).toIndexedSeq
      dot(rq, qq).toDouble /
        (math.sqrt(dot(rq, rq).toDouble) * math.sqrt(qn2.toDouble))
    }
    val rows = ProductQuant.ivfPqResidualTopK(spark, sf).collect()
    assert(rows.length == Similarity.TopK)
    rows.foreach { r =>
      assert(r.getDouble(3) == residCos(r.getLong(0)),
        s"residual score mismatch for vec ${r.getLong(0)}")
    }
    // the architectural claim (Jégou et al. §IV): at the same code
    // budget, residual encoding reconstructs with no more total squared
    // error than raw-vector encoding
    def sqErr(books: IndexedSeq[IndexedSeq[(Long, IndexedSeq[Long])]],
        frame: IndexedSeq[(Long, Any, IndexedSeq[Long])],
        back: Long => IndexedSeq[Long]): Double =
      frame.map { case (id, _, v) =>
        val recon = reconFrom(books, v)
        val full = back(id)
        val origin = rawById(id)
        origin.indices.map { i =>
          val d = (origin(i) - (full(i) + recon(i))).toDouble; d * d }.sum
      }.sum
    val zero = IndexedSeq.fill(Similarity.Dims)(0L)
    val errResid = sqErr(localResid, resid, id => centMap(cellOf(rawById(id))))
    val errRaw = sqErr(localRaw, corpus, _ => zero)
    assert(errResid <= errRaw,
      s"residual reconstruction error $errResid exceeds raw $errRaw")
  }

  test("streaming pq encoder emits the batch encoder's codes exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqenc").toString
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$sf/embeddings.parquet"),
      java.nio.file.Path.of(dir, "embeddings.parquet"))
    val q = graft.streaming.EmbedStream.pqEncodeStream(
      graft.streaming.EmbedStream.readEmbeddingsStream(spark, dir), spark, sf)
      .writeStream.format("memory").queryName("pq_encode_stream_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("pq_encode_stream_test")
      .orderBy("vec_id").collect().map(_.toSeq)
    val batch = ProductQuant.pqEncode(spark, sf)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }
}
