package graft

import graft.functions.TextOps
import graft.operators.{Similarity, TextAnalysis}
import graft.sources.Tables

class TextSimilaritySpec extends SparkSpec {

  test("quality scores are in [0, 1]") {
    val rows = TextAnalysis.qualityScore(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.forall { r =>
      val q = r.getAs[Double]("quality"); q >= 0.0 && q <= 1.0 + 1e-9
    })
  }

  test("PII redaction fires on every row and leaves no match behind") {
    val rows = graft.operators.TextAnalysis.textRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    // the synthesized PII guarantees at least one email and one long
    // number per doc — a zero count means the regex silently missed
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") >= 1, s"doc ${r.getLong(0)}: no email matched")
      assert(r.getAs[Long]("n_longnums") >= 1, s"doc ${r.getLong(0)}: no number matched")
    }
  }

  test("language-ID confusion matrix covers every document") {
    val n = TextAnalysis.langIdConfusion(spark, sf).collect().map(_.getAs[Long]("n")).sum
    assert(n == Tables.documents(spark, sf).count())
  }

  test("char-n-gram language ID covers every document; CJK text scores through grams") {
    val rows = TextAnalysis.langIdNgramConfusion(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.documents(spark, sf).count())
    val valid = TextOps.StopwordsByLang.map(_._1).toSet + "unknown"
    assert(rows.forall(r => valid(r.getAs[String]("pred_lang"))))
    // (the fixture's lang labels sit on synthetic English-word text, so
    // accuracy is not assertable there) — pin the CJK property directly:
    // unsegmented zh text scores via character grams, no whitespace
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mass = Seq(("我是不在了和的有", "x"), ("nothing matching here", "y"))
      .toDF("text", "id")
      .select(col("id"), TextOps.charGramMass(col("text"),
        TextOps.StopwordsByLang.toMap.apply("zh")).as("m"))
      .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue)).toMap
    assert(mass("x") == 8L && mass("y") == 0L)
  }

  test("kmv keyword df is exact below the sketch size and scores rank identically there") {
    import org.apache.spark.sql.functions._
    // exact df per term, computed the same way the sketch sees docs
    // (distinct 60-bit doc-id hashes)
    val exactDf = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(TextOps.tokens(TextOps.normText(col("text")))).as("term"))
      .select(col("term"), TextOps.hash60(col("doc_id").cast("string")).as("dh"))
      .groupBy(col("term")).agg(countDistinct(col("dh")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = TextAnalysis.keywordsPerSourceKmv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = exactDf(r.getAs[String]("term"))
      // saturation must be judged on the TRUE distinct count: a
      // saturated sketch's estimate can dip below k through estimator
      // noise, which is correct behavior, not an exactness violation
      if (exact < TextAnalysis.KeywordDfK)
        assert(r.getAs[Double]("df_est") == exact.toDouble,
          s"unsaturated sketch must be exact for ${r.getAs[String]("term")}")
    }
  }

  test("corpus manifest: canonical, quality-gated, allowlisted, deterministic") {
    import graft.operators.{Curation, DedupOps}
    val keep = DedupOps.dedupExact(spark, sf).collect()
      .map(_.getAs[Long]("keep_doc_id")).toSet
    val rows = Curation.corpusManifest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(keep(r.getAs[Long]("doc_id")), "manifest doc must be a canonical representative")
      assert(r.getAs[Double]("quality") >= Curation.QualityMin)
      assert(Curation.LangAllow.contains(r.getAs[String]("lang")))
    }
    // hash-modulo sampling is a pure function of the data: a rerun is
    // bit-identical, no rand() anywhere
    val again = Curation.corpusManifest(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sameElements(again.map(_.getLong(0))))
  }

  test("sequence packing conserves docs and tokens within every shard") {
    import graft.operators.Packing
    import org.apache.spark.sql.functions._
    val rows = Packing.packSequences(spark, sf).collect()
    assert(rows.nonEmpty)
    val totals = Tables.documents(spark, sf)
      .select(col("lang"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("lang")).agg(count(lit(1)).as("docs"), sum(col("n")).as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_.getString(0)).foreach { case (lang, seqs) =>
      assert(seqs.map(_.getAs[Long]("n_docs")).sum == totals(lang)._1,
        s"$lang: packing must conserve documents")
      assert(seqs.map(_.getAs[Long]("seq_tokens")).sum == totals(lang)._2,
        s"$lang: packing must conserve tokens")
      // within each shard the chunk ids start at 0 and are distinct
      seqs.groupBy(_.getAs[Long]("shard")).foreach { case (_, g) =>
        val ids = g.map(_.getAs[Long]("seq_id"))
        assert(ids.min == 0 && ids.distinct.length == ids.length)
      }
    }
  }

  test("packing shard count is conf-settable; totals are shard-invariant") {
    import graft.operators.Packing
    val base = Packing.packSequences(spark, sf).collect()
    def perLang(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getString(0)).view.mapValues(g =>
        (g.map(_.getAs[Long]("n_docs")).sum, g.map(_.getAs[Long]("seq_tokens")).sum)).toMap
    spark.conf.set(graft.GraftConf.PackingShardsKey, "32")
    try {
      val wide = Packing.packSequences(spark, sf).collect()
      val shards = wide.map(_.getAs[Long]("shard")).distinct
      assert(shards.forall(s => s >= 0 && s < 32))
      assert(shards.length > graft.GraftConf.DefaultPackingShards,
        "32-way sharding must actually spread the corpus wider than the default 8")
      // sharding is a parallelism knob: per-language doc/token totals
      // are identical at any shard count
      assert(perLang(wide) == perLang(base))
    } finally spark.conf.unset(graft.GraftConf.PackingShardsKey)
  }

  test("eval overlap pairs a non-eval corpus doc with an eval doc on rare shingles") {
    import graft.operators.Decontamination
    import org.apache.spark.sql.functions._
    val bySource = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Decontamination.evalOverlap(spark, sf).collect()
    assert(rows.nonEmpty, "fixture plants cross-source near-dups; empty means the pipeline broke")
    rows.foreach { r =>
      assert(bySource(r.getAs[Long]("eval_doc")) == Decontamination.EvalSource)
      assert(bySource(r.getAs[Long]("corpus_doc")) != Decontamination.EvalSource)
      assert(r.getAs[Long]("n_shared") >= Decontamination.MinShared)
    }
  }

  test("non-broadcast decontamination path returns identical overlaps") {
    import graft.operators.Decontamination
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bcRows = Decontamination.evalOverlap(spark, sf)
    val bcResult = key(bcRows.collect())
    spark.conf.set(graft.GraftConf.DeconBroadcastEvalKey, "false")
    try {
      val plain = Decontamination.evalOverlap(spark, sf)
      // the hints must actually be gone from the plan (AQE may still
      // CHOOSE a broadcast from runtime stats — that's its job — but
      // nothing may force one)
      import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
      assert(plain.queryExecution.analyzed.collect { case h: ResolvedHint => h }.isEmpty,
        "flag=false must drop every broadcast hint")
      assert(bcRows.queryExecution.analyzed.collect { case h: ResolvedHint => h }.nonEmpty,
        "default path should carry the broadcast hints")
      assert(key(plain.collect()) == bcResult,
        "broadcast flag is a planning knob; results must be identical")
    } finally spark.conf.unset(graft.GraftConf.DeconBroadcastEvalKey)
  }

  test("mixture sampling hits its target when available, keeps whole languages when not") {
    import graft.operators.Curation
    val targets = Curation.mixtureTargets.toMap
    val rows = Curation.mixtureSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, selected, available, target) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(target == targets(lang))
      assert(selected <= available)
      if (available <= target) assert(selected == available,
        s"$lang: under-supplied languages must be kept whole")
    }
  }

  test("BPE-ish token count >= whitespace token count per source") {
    val rows = TextAnalysis.tokenCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens")))
  }

  test("fingerprints: one per doc, min-shingle hash never null") {
    val rows = TextAnalysis.fingerprints(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.forall(!_.isNullAt(2)))
  }

  test("aggregator sampler equals the window sampler under repartitioning") {
    val win = TextAnalysis.samplePerSource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val agg = TextAnalysis.samplePerSourceAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(win.sameElements(agg))
  }

  test("brute-force cosine top-K is sorted and within [-1, 1]") {
    val rows = Similarity.cosineTopK(spark, sf).collect()
    assert(rows.length == Similarity.TopK)
    val sims = rows.map(_.getAs[Double]("cos_sim"))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
    assert(sims.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
  }

  test("IVF top-K probes cells only and cannot beat brute force") {
    val brute = Similarity.cosineTopK(spark, sf).collect().map(_.getAs[Double]("cos_sim"))
    val ivf = Similarity.ivfTopK(spark, sf).collect()
    assert(ivf.nonEmpty)
    assert(ivf.map(_.getAs[Double]("cos_sim")).max <= brute.max + 1e-12)
    // every hit is assigned to one of the probed cells (cid in 1..16)
    assert(ivf.forall { r => val c = r.getAs[Long]("cid"); c >= 1 && c <= Similarity.NumCentroids })
  }

  test("k-means centroids are reproducible and improve IVF recall vs fixed probes") {
    val c1 = Similarity.kmeansCentroids(spark, sf, 8, 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    val c2 = Similarity.kmeansCentroids(spark, sf, 8, 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(c1.map(_._1).sameElements(c2.map(_._1)))
    assert(c1.zip(c2).forall { case ((_, a), (_, b)) => a == b })
    val cent = Similarity.kmeansCentroids(spark, sf, 8, 2)
    val hits = Similarity.ivfSearchWith(spark, sf, cent).collect()
    assert(hits.nonEmpty)
    val brute = Similarity.cosineTopK(spark, sf).collect().map(_.getAs[Double]("cos_sim"))
    assert(hits.map(_.getAs[Double]("cos_sim")).max <= brute.max + 1e-12)
  }

  test("k-means keeps executor storage and plan size constant across iterations") {
    val baseline = spark.sparkContext.getPersistentRDDs.size
    val cent = Similarity.kmeansCentroids(spark, sf, 8, 10)
    // each iteration checkpoints the new centroids and frees the prior
    // ones, so 10 iterations leave exactly one live checkpoint RDD
    assert(spark.sparkContext.getPersistentRDDs.size <= baseline + 1)
    assert(cent.count() == 8) // empty cells keep their centroid — never fewer than k
    // lineage is truncated: the 10th iteration's plan must not embed the
    // whole 9-iteration pipeline (which would be thousands of nodes)
    assert(cent.queryExecution.analyzed.collectLeaves().size <= 2)
  }

  test("ivf.k=auto derives ceil(sqrt(n)) cells and serves like the explicit k") {
    import graft.GraftConf
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    val expectK = math.max(GraftConf.DefaultIvfK,
      math.ceil(math.sqrt(n.toDouble)).toInt)
    // explicit mode must not evaluate the corpus count (no count job)
    assert(GraftConf.ivfKResolved(spark,
      sys.error("corpus count evaluated in explicit mode")) == GraftConf.DefaultIvfK)
    spark.conf.set(GraftConf.IvfKKey, "auto")
    try {
      assert(GraftConf.ivfKResolved(spark, n) == expectK)
      val auto = Similarity.ivfTrainedTopK(spark, sf).collect()
      assert(auto.nonEmpty)
      spark.conf.set(GraftConf.IvfKKey, expectK.toString)
      val explicit = Similarity.ivfTrainedTopK(spark, sf).collect()
      // auto resolves to the SAME quantizer as the explicit cell count
      // (shared memo key carries the resolved k, so this also pins that
      // auto and explicit land on one build, not two)
      assert(auto.sameElements(explicit))
    } finally spark.conf.unset(GraftConf.IvfKKey)
  }

  test("ivf.k rejects unparseable values with the intended message, not a NumberFormatException") {
    import graft.GraftConf
    for (bad <- Seq("automatic", "8k", "")) {
      spark.conf.set(GraftConf.IvfKKey, bad)
      try {
        val e = intercept[IllegalArgumentException](
          GraftConf.ivfKResolved(spark, sys.error("must not count")))
        assert(e.getMessage.contains(GraftConf.IvfKKey), s"for '$bad': ${e.getMessage}")
      } finally spark.conf.unset(GraftConf.IvfKKey)
    }
    // the clamp bounds of the auto formula itself
    assert(GraftConf.autoIvfK(1) == GraftConf.DefaultIvfK)
    assert(GraftConf.autoIvfK(10000) == 100)
    assert(GraftConf.autoIvfK(Long.MaxValue) == GraftConf.MaxAutoIvfK)
  }

  test("knn_label_ivf_auto matches a conf-driven auto run (two spellings, one serving path)") {
    import graft.GraftConf
    val viaExplicit = Similarity.knnLabelIvfAuto(spark, sf).collect()
    spark.conf.set(GraftConf.IvfKKey, "auto")
    try {
      // the conf-driven auto path trains the same quantizer (shared
      // k-keyed memo) and must serve identical labels
      val viaConf = Similarity.knnLabelIvf(spark, sf).collect()
      assert(viaExplicit.nonEmpty && viaExplicit.sameElements(viaConf))
    } finally spark.conf.unset(GraftConf.IvfKKey)
  }

  test("fixture-scale corpus plans no rebalance exchange; members arrays are canonical") {
    // the bytes gate: sub-MB embedding fixtures must NOT pay a
    // round-robin exchange before the kernel pass (the r10 1.3-1.7x
    // kNN/ANN drift) — no shuffle boundary below the quantize project
    val plan = Similarity.cosineTopK(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("RoundRobinPartitioning"),
      s"fixture-scale corpus() added a rebalance exchange:\n$plan")
    // knnCellIndex members are sorted by vec_id at build time (canonical
    // persisted artifact, not shuffle arrival order)
    Similarity.knnCellIndex(spark, sf).collect().foreach { r =>
      val ids = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("members")).map(_.getLong(0))
      assert(ids == ids.sorted, s"cell ${r.get(0)} members not vec_id-sorted")
    }
  }

  test("persisted trained index serves identically to the in-session memo") {
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_index").toString + "/idx"
    Similarity.saveTrainedIndex(spark, sf, dir)
    // the artifact really is the quantizer: same k rows, and serving
    // from the load is bit-identical to serving from the session memo
    assert(Similarity.loadTrainedIndex(spark, dir).count() == Similarity.TrainedK)
    val fromIndex = Similarity.ivfTopKFromIndex(spark, sf, dir).collect()
    val fromMemo = Similarity.ivfTrainedTopK(spark, sf).collect()
    assert(fromIndex.sameElements(fromMemo))
  }

  test("persisted index serves from a FRESH session without retraining") {
    import graft.operators.Similarity
    // the model-store deployment shape: train+save in one session,
    // serve from the artifact in another that never sees the training
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_xsess").toString + "/idx"
    Similarity.saveTrainedIndex(spark, sf, dir)
    val trained = Similarity.ivfTrainedTopK(spark, sf).collect()
    val serving = spark.newSession() // fresh conf + temp-view catalog, shared context
    val served = Similarity.ivfTopKFromIndex(serving, sf, dir).collect()
    assert(served.sameElements(trained))
    // proof the serving session really served from the artifact: no
    // k-means memo view was ever registered in it (training would have)
    val memos = serving.conf.getOption("spark.graft.ckpt.names").getOrElse("")
    assert(!memos.contains("kmeans_cent"),
      s"fresh serving session trained its own quantizer: $memos")
  }

  test("ANN top-K is a subset of the corpus ranked no better than brute force") {
    val brute = Similarity.cosineTopK(spark, sf).collect().map(_.getAs[Double]("cos_sim"))
    val ann = Similarity.annTopK(spark, sf).collect().map(_.getAs[Double]("cos_sim"))
    assert(ann.nonEmpty)
    // ANN searches one bucket: its best hit cannot beat the global best.
    assert(ann.max <= brute.max + 1e-12)
  }

  test("semantic dedup: per-cell pair accounting and drop semantics hold") {
    val rows = Similarity.semanticDedup(spark, sf).collect()
    val corpusN = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.length == corpusN) // every vector gets a verdict
    // within each cell: the i-th vector (by vec_id) has i earlier mates,
    // so per-cell n_prior sums to m(m-1)/2 and exactly one vector (the
    // first) has no prior and a null max_prior_cos
    rows.groupBy(_.getAs[Long]("cid")).foreach { case (_, cell) =>
      val m = cell.length.toLong
      assert(cell.map(_.getAs[Long]("n_prior")).sum == m * (m - 1) / 2)
      assert(cell.count(_.isNullAt(cell.head.fieldIndex("max_prior_cos"))) == 1)
    }
    assert(rows.forall { r =>
      val dropped = r.getAs[Boolean]("dropped")
      val cos = Option(r.getAs[java.lang.Double]("max_prior_cos")).map(_.doubleValue)
      if (dropped) cos.exists(_ >= Similarity.SemDedupTau)
      else cos.forall(_ < Similarity.SemDedupTau)
    })
  }

  test("semantic dedup cell cap: over-cap cells degrade to conservative no-drop verdicts") {
    try {
      // cap 0 forces every cell over-cap: no pairs may form, every
      // vector keeps n_prior=0 / null cosine / dropped=false
      spark.conf.set(graft.GraftConf.SemdedupCellCapKey, "0")
      val rows = Similarity.semanticDedup(spark, sf).collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => r.getAs[Long]("n_prior") == 0 &&
        r.isNullAt(r.fieldIndex("max_prior_cos")) && !r.getAs[Boolean]("dropped")))
    } finally spark.conf.unset(graft.GraftConf.SemdedupCellCapKey)
  }

  test("source overlap: ordered pairs, intersection bounded by both set sizes") {
    val rows = TextAnalysis.sourceOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[String]("src_a") < r.getAs[String]("src_b")))
    assert(rows.forall { r =>
      val common = r.getAs[Long]("n_common")
      val j = r.getAs[Double]("jaccard")
      common >= 1 && common <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) &&
        j > 0 && j <= 1.0
    })
    // no duplicate pair from the combination explode
    val pairs = rows.map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")))
    assert(pairs.distinct.length == pairs.length)
  }

  test("boilerplate exposure: counts bounded, only shingle-bearing docs appear") {
    val rows = graft.operators.QualityFilters.boilerplateStats(spark, sf).collect()
    val withShingles = graft.sources.Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.size(
        graft.functions.TextOps.tokens(org.apache.spark.sql.functions.col("text")))
        >= graft.operators.DedupOps.ShingleK)
      .count()
    assert(rows.length == withShingles)
    assert(rows.forall { r =>
      val n = r.getAs[Long]("n_shingles"); val b = r.getAs[Long]("n_boiler")
      n >= 1 && b >= 0 && b <= n &&
        math.abs(r.getAs[Double]("boiler_frac") - b.toDouble / n) < 1e-15
    })
    // the boilerplate set is corpus-level: at least one doc must touch it
    assert(rows.exists(_.getAs[Long]("n_boiler") > 0))
  }

  test("knn label assignment matches a local brute-force vote") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val all = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.round(x.toDouble * 1000000.0)).toArray))
    val (qs, corpus) = all.partition(_._1 % Similarity.KnnQueryMod == 0)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val expected = qs.map { case (qid, _, qv) =>
      val top = corpus.map { case (id, lab, v) => (cos(v, qv), id, lab) }
        .sortBy { case (c, id, _) => (-c, id) }.take(Similarity.KnnK)
      val votes = top.groupBy(_._3).map { case (l, v) => (l, v.length) }
      val (lab, n) = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
      qid -> ((lab, n.toLong))
    }.toMap
    val rows = Similarity.knnLabel(spark, sf).collect()
    assert(rows.length == qs.length && rows.nonEmpty)
    rows.foreach { r =>
      val (lab, n) = expected(r.getAs[Long]("query_id"))
      assert(r.getAs[Int]("pred_label") == lab)
      assert(r.getAs[Long]("n_votes") == n)
    }
    // the vote is non-degenerate somewhere: not every query is unanimous
    assert(rows.exists(_.getAs[Long]("n_votes") < Similarity.KnnK))
  }

  test("knn IVF route labels the same query set with bounded votes") {
    import graft.operators.Similarity
    val brute = Similarity.knnLabel(spark, sf).collect()
    val ivf = Similarity.knnLabelIvf(spark, sf).collect()
    assert(ivf.map(_.getAs[Long]("query_id")).toSeq ==
      brute.map(_.getAs[Long]("query_id")).toSeq,
      "every held-out query must receive a label from the probed cells")
    assert(ivf.forall { r =>
      val v = r.getAs[Long]("n_votes"); v >= 1 && v <= Similarity.KnnK
    })
    // probing is a recall knob, not a rewrite: most predictions agree
    // with brute force on this corpus (cells cover half the space)
    val bruteBy = brute.map(r => r.getAs[Long]("query_id") -> r.getAs[Int]("pred_label")).toMap
    val agree = ivf.count(r => bruteBy(r.getAs[Long]("query_id")) == r.getAs[Int]("pred_label"))
    assert(agree * 2 >= ivf.length, s"only $agree/${ivf.length} IVF labels agree with brute force")
  }

  test("cell quality report partitions the corpus over the trained cells") {
    import graft.operators.Similarity
    val rows = Similarity.cellQualityReport(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Similarity.TrainedK)
    assert(rows.map(_.getAs[Long]("n_members")).sum ==
      graft.sources.Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("min_cos"), r.getAs[Double]("max_cos"))
      assert(lo <= hi && lo >= -1.0 - 1e-9 && hi <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_members") >= 1)
    }
  }

  test("BestKByScore is partitioning-invariant") {
    import org.apache.spark.sql.functions.{col, udaf}
    import spark.implicits._
    val agg = udaf(new graft.functions.BestKByScore(3))
    val data = Seq(
      (1L, 0.9, 10L, 1), (1L, 0.8, 11L, 2), (1L, 0.9, 9L, 3), (1L, 0.1, 12L, 1),
      (2L, 0.5, 20L, 5), (2L, 0.5, 21L, 6)).toDF("g", "cos", "id", "lab")
    def run(parts: Int) = data.repartition(parts)
      .groupBy(col("g"))
      .agg(agg(col("cos"), col("id"), col("lab")).as("top"))
      .orderBy(col("g")).collect().map(_.toString).toSeq
    val one = run(1)
    assert(run(7) == one && run(3) == one)
    // ties on cos break by id: (0.9, 9) must precede (0.9, 10)
    assert(one.head.contains("[0.9,9,3]") || one.head.contains("{0.9, 9, 3}") ||
      one.head.indexOf("9") < one.head.indexOf("10"))
  }

  test("int8 top-K ranks by the quantized cosine, recomputed driver-side") {
    import graft.operators.Quantization
    val got = Quantization.int8TopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim8")))
    assert(got.length == Similarity.TopK)
    assert(got.map(_._2).sameElements(got.map(_._2).sorted(Ordering[Double].reverse)))
    // brute-force: quantize every vector to int8 and rank by integer dot
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def q8(v: Array[Double]): Array[Long] = {
      val m = v.map(math.abs).max
      // round half AWAY FROM ZERO — Spark/DuckDB round(), not math.round
      def r(x: Double): Long = (math.signum(x) * math.round(math.abs(x))).toLong
      if (m == 0) v.map(_ => 0L) else v.map(x => r(x * 127 / m))
    }
    val qq = q8(vecs(Similarity.QueryVecId))
    val qn = qq.map(x => x * x).sum
    val expected = vecs.toSeq.collect { case (id, v) if id != Similarity.QueryVecId =>
      val c = q8(v); val n = c.map(x => x * x).sum
      (id, n)
    }.filter(_._2 > 0).map { case (id, n) =>
      val dot = q8(vecs(id)).zip(qq).map { case (a, b) => a * b }.sum
      (id, dot.toDouble / (math.sqrt(n.toDouble) * math.sqrt(qn.toDouble)))
    }.sortBy { case (id, c) => (-c, id) }.take(Similarity.TopK)
    assert(got.sameElements(expected))
  }
}
