package graft

import graft.operators.{EventOps, Multimodal}
import graft.sources.Tables

class EventMultimodalSpec extends SparkSpec {

  test("hourly windows partition all events") {
    val n = EventOps.hourlyEventCounts(spark, sf).collect().map(_.getAs[Long]("n_events")).sum
    assert(n == Tables.events(spark, sf).count())
  }

  test("incremental hourly merge equals the full recompute; the cutoff bucket straddles") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val got = EventOps.hourlyCountsIncremental(spark, dir).collect().map(_.toString)
    val full = EventOps.hourlyEventCounts(spark, dir).collect().map(_.toString)
    assert(got.sameElements(full))
    // the cutoff hour has rows on BOTH sides of the cutoff instant, so
    // the additive merge of a partially-built bucket is actually
    // exercised (an hour-aligned cutoff would make the union disjoint)
    val cutoff = lit(EventOps.HourlyIncrCutoff).cast("timestamp")
    val inCutoffHour = Tables.events(spark, dir)
      .where(col("ts").isNotNull &&
        date_trunc("hour", col("ts")) === date_trunc("hour", cutoff))
    assert(inCutoffHour.where(col("ts") < cutoff).count() > 0)
    assert(inCutoffHour.where(col("ts") >= cutoff).count() > 0)
  }

  test("native session_window: partitions all events; exact-gap event starts a NEW session") {
    import org.apache.spark.sql.functions._
    // fixture identity: every event lands in exactly one native session
    val rows = EventOps.sessionWindowNative(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sf).where(col("ts").isNotNull && col("user_id").isNotNull).count())
    // boundary semantics (empirical pin — this is what the oracle's
    // strict `delta > gap` split relies on): an event at EXACTLY gap
    // after its predecessor still merges; one microsecond past opens a
    // new session
    import spark.implicits._
    val gapMin = 30
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = new java.sql.Timestamp(t0.getTime + gapMin * 60000L) // exactly gap
    val two = Seq((1L, 1L, t0), (2L, 1L, t1))
      .toDF("event_id", "user_id", "ts")
    assert(EventOps.sessionWindowAgg(two, gapMin).count() == 1)
    val t1out = java.sql.Timestamp.from(t0.toInstant
      .plusSeconds(gapMin * 60L).plusNanos(1000))
    val twoOut = Seq((1L, 1L, t0), (2L, 1L, t1out))
      .toDF("event_id", "user_id", "ts")
    assert(EventOps.sessionWindowAgg(twoOut, gapMin).count() == 2)
  }

  test("z-order layout: buckets partition all rows and beat a single-key sort's skip area") {
    import graft.operators.LayoutOps
    import org.apache.spark.sql.functions._
    val rows = LayoutOps.zorderLayout(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    assert(rows.map(_.getAs[Long]("n_rows")).sum == li.count())
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < LayoutOps.ZFiles
    })
    def area(r: org.apache.spark.sql.Row): Long =
      (r.getAs[Long]("p_max") - r.getAs[Long]("p_min") + 1) *
        (r.getAs[Long]("s_max") - r.getAs[Long]("s_min") + 1)
    val zArea = rows.map(area).sum
    // the contrast layout: same file count, cut by partkey rank alone
    val linear = li.select(col("l_partkey"), col("l_suppkey"))
      .withColumn("bucket", ntile(LayoutOps.ZFiles)
        .over(org.apache.spark.sql.expressions.Window.orderBy(col("l_partkey"))))
      .groupBy(col("bucket"))
      .agg(min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
        min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
      .collect()
    val linArea = linear.map(area).sum
    // both keys stay narrow on the curve; the sorted layout leaves
    // suppkey spanning ~the whole domain in every file
    assert(zArea < linArea,
      s"z-order area $zArea should beat single-key-sort area $linArea")
  }

  test("sessions partition all events; end >= start; gap rule holds across sessions") {
    val rows = EventOps.sessionize(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count())
    assert(rows.forall(r =>
      !r.getAs[java.sql.Timestamp]("session_end").before(r.getAs[java.sql.Timestamp]("session_start"))))
    // consecutive sessions of one user are separated by more than the gap
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("session_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapMs = b.getAs[java.sql.Timestamp]("session_start").getTime -
            a.getAs[java.sql.Timestamp]("session_end").getTime
          assert(gapMs > 30 * 60 * 1000L, s"sessions closer than the gap: $gapMs ms")
        case _ =>
      }
    }
  }

  test("top-N per group emits at most N rows per group, ranked") {
    val rows = EventOps.topPartsPerFlag(spark, sf).collect()
    rows.groupBy(_.getAs[String]("l_returnflag")).foreach { case (_, g) =>
      assert(g.length <= 3)
      assert(g.map(_.getAs[Long]("rn")).sorted.sameElements((1 to g.length).map(_.toLong)))
    }
  }

  test("as-of join picks the latest right row at or before each left ts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 1L, t("2024-01-01 10:00:00")),  // after two clicks -> latest (09:30)
      (2L, 1L, t("2024-01-01 09:00:00")),  // exactly simultaneous click counts (<=)
      (3L, 2L, t("2024-01-01 10:00:00")),  // user 2 has no clicks -> null
      (4L, 1L, t("2024-01-01 08:00:00"))   // before every click -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, t("2024-01-01 09:00:00"), t("2024-01-01 09:00:00"), 100L),
      (1L, t("2024-01-01 09:30:00"), t("2024-01-01 09:30:00"), 101L)
    ).toDF("user_id", "ts", "click_ts", "click_id")
    val out = graft.operators.AsofJoin
      .asofJoin(left, right, "user_id", "ts", Seq("click_ts", "click_id"))
      .orderBy("event_id").collect()
    assert(out.map(r => (r.getLong(0), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .sameElements(Array((1L, 101L), (2L, 100L), (3L, -1L), (4L, -1L))))
    // nullable payload: every payload column must come from the SAME
    // matched row — a null field on the latest right row stays null, it
    // must NOT be backfilled from an older right row (torn row)
    val leftN = Seq((1L, 9L, t("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val rightN = Seq(
      (9L, t("2024-01-01 09:00:00"), Some(t("2024-01-01 09:00:00")), Some(200L)),
      (9L, t("2024-01-01 09:30:00"), Some(t("2024-01-01 09:30:00")), None: Option[Long])
    ).toDF("user_id", "ts", "click_ts", "click_id")
    val torn = graft.operators.AsofJoin
      .asofJoin(leftN, rightN, "user_id", "ts", Seq("click_ts", "click_id")).collect()(0)
    assert(torn.getAs[java.sql.Timestamp]("click_ts").toString.startsWith("2024-01-01 09:30"))
    assert(torn.isNullAt(torn.fieldIndex("click_id")),
      "click_id must be the 09:30 row's null, not backfilled from 09:00")
    // the fixture query: one output row per purchase, attribution never
    // in the future
    val attr = EventOps.purchaseAttribution(spark, sf).collect()
    val nPurch = Tables.events(spark, sf).where(col("event_type") === "purchase").count()
    assert(attr.length == nPurch)
    assert(attr.filter(!_.isNullAt(3)).forall(r =>
      !r.getAs[java.sql.Timestamp]("click_ts").after(r.getAs[java.sql.Timestamp]("ts"))))
    // reserved helper names on an input must fail fast, not silently
    // clobber the caller's column
    val clash = left.withColumn("_pay", lit(0))
    val err = intercept[IllegalArgumentException] {
      graft.operators.AsofJoin.asofJoin(clash, right, "user_id", "ts", Seq("click_id"))
    }
    assert(err.getMessage.contains("_pay"))
  }

  test("sliding windows hold each event exactly twice") {
    val n = EventOps.slidingEventCounts(spark, sf).collect().map(_.getAs[Long]("n_events")).sum
    assert(n == 2 * Tables.events(spark, sf).count())
  }

  test("rollup grand total equals the row count; subtotals are consistent") {
    val rows = graft.operators.AnalyticsExt.rollupPricing(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand(0).getAs[Long]("n_rows") == total)
    val perFlag = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1)).map(_.getAs[Long]("n_rows")).sum
    assert(perFlag == total)
  }

  test("median is within the group's min/max and sample is k per source") {
    val med = graft.operators.AnalyticsExt.medianQuantity(spark, sf).collect()
    assert(med.nonEmpty && med.forall(r => r.getAs[Double]("median_qty") > 0))
    val sample = graft.operators.TextAnalysis.samplePerSource(spark, sf).collect()
    sample.groupBy(_.getAs[String]("source")).foreach { case (_, g) => assert(g.length <= 5) }
  }

  test("multimodal stats cover every source with positive byte totals") {
    val rows = Multimodal.multimodalStats(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == Tables.documents(spark, sf).count())
    assert(rows.forall(_.getAs[Long]("total_bytes") > 0))
  }

  test("png codec: every generated payload decodes to its generator dims and raster") {
    val media = Multimodal.pngPayloads(spark, sf)
    val decoded = Multimodal.decodeAll(media).collect()
    assert(decoded.length == Tables.documents(spark, sf).count())
    assert(decoded.forall(d =>
      d.width >= 1 && d.width <= Multimodal.DimMod &&
      d.height >= 1 && d.height <= Multimodal.DimMod && d.channels == 3))
    // the decoded-raster checksum must equal the pixel function summed
    // directly — proves the PNG roundtrip is lossless, not just "reads"
    decoded.foreach { d =>
      var expect = 0L
      for (y <- 0 until d.height.toInt; x <- 0 until d.width.toInt; c <- 0 until 3)
        expect += Multimodal.pixelValue(d.doc_id, x, y, c)
      assert(d.checksum == expect, s"doc ${d.doc_id}: raster diverged from generator")
    }
    val again = Multimodal.decodeAll(media).collect()
    assert(decoded.map(_.checksum).sorted.sameElements(again.map(_.checksum).sorted))
  }

  test("malformed payloads are rejected; valid ones survive the same batch") {
    import spark.implicits._
    val goodPng = Multimodal.renderPng(1L, 5, 4)
    val ds = spark.createDataset(Seq(
      Multimodal.Media(1L, "srcA", goodPng),
      Multimodal.Media(2L, "srcA", Array[Byte](1, 2, 3, 4)),     // garbage
      Multimodal.Media(3L, "srcA", goodPng.take(20)),            // truncated mid-header
      Multimodal.Media(4L, "srcA", Array.empty[Byte])))          // empty
    val out = Multimodal.decodeAll(ds).collect()
    assert(out.map(_.doc_id).toSet == Set(1L), "only the valid PNG may survive")
    assert(out(0).width == 5 && out(0).height == 4 && out(0).channels == 3)
    // resize rejects the same rows instead of crashing the partition
    assert(Multimodal.resizeAll(ds, 2).collect().map(_.doc_id).toSet == Set(1L))
  }

  test("wav codec: every generated payload decodes to its generator signal") {
    val decoded = Multimodal.multimodalAudio(spark, sf).collect()
    assert(decoded.length == Tables.documents(spark, sf).count())
    decoded.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = r.getAs[Long]("n_samples").toInt
      assert(n >= 8 && n < 8 + Multimodal.AudioSampleMod)
      assert(Set(8000L, 12000L, 16000L, 20000L)(r.getAs[Long]("sample_rate")))
      // the decoded signal must equal the sample function summed
      // directly — proves the WAV roundtrip is exact, not just "reads"
      var (sumAbs, sumSq) = (0L, 0L)
      for (i <- 0 until n) {
        val s = Multimodal.sampleValue(id, i).toLong
        sumAbs += math.abs(s); sumSq += s * s
      }
      assert(r.getAs[Long]("sum_abs") == sumAbs, s"doc $id: signal diverged")
      assert(r.getAs[Long]("sum_sq") == sumSq, s"doc $id: squared sum diverged")
      assert(r.getAs[Long]("duration_us") ==
        n.toLong * 1000000L / r.getAs[Long]("sample_rate"))
    }
  }

  test("video container: real per-frame PNG roundtrip; malformed containers rejected") {
    val good = Multimodal.renderVideo(5L, 3, 6, 4)
    val frames = Multimodal.decodeVideo(good).get
    assert(frames.length == 3)
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.getWidth == 6 && img.getHeight == 4)
      var expect = 0L
      val fid = Multimodal.videoFrameId(5L, f)
      for (y <- 0 until 4; x <- 0 until 6; c <- 0 until 3)
        expect += Multimodal.pixelValue(fid, x, y, c)
      assert(Multimodal.rgbSum(img) == expect, s"frame $f raster diverged")
    }
    // malformed: wrong magic, truncated mid-frame, one corrupt frame
    assert(Multimodal.decodeVideo("XVID1234".getBytes).isEmpty)
    assert(Multimodal.decodeVideo(good.take(10)).isEmpty)
    // offset 12 = first byte of frame 0's PNG signature (magic 4 +
    // frame count 4 + length 4); breaking it makes that frame
    // unreadable while the container header stays valid
    val corrupt = good.clone(); corrupt(12) = 99
    assert(Multimodal.decodeVideo(corrupt).isEmpty,
      "a bad frame must reject the whole document, not half-decode")
    assert(Multimodal.decodeVideo(Array.empty[Byte]).isEmpty)
  }

  test("malformed wav payloads are rejected; valid ones survive the same batch") {
    val goodWav = Multimodal.renderWav(1L, 16, 8000)
    assert(Multimodal.decodeWav(goodWav).isDefined)
    assert(Multimodal.decodeWav(Array[Byte](1, 2, 3, 4)).isEmpty, "garbage")
    assert(Multimodal.decodeWav(goodWav.take(10)).isEmpty, "truncated header")
    assert(Multimodal.decodeWav(Array.empty[Byte]).isEmpty, "empty")
    // a PNG is not audio: the reader must refuse it, not misparse it
    assert(Multimodal.decodeWav(Multimodal.renderPng(1L, 4, 4)).isEmpty)
    // a format the stats loop cannot read (8-bit, stereo, big-endian)
    // is rejected, not misinterpreted or walked out of bounds
    import javax.sound.sampled.AudioFormat
    val pcm = Array[Byte](1, 2, 3, 4)
    assert(Multimodal.pcmStats(new AudioFormat(8000f, 8, 1, true, false), pcm).isEmpty)
    assert(Multimodal.pcmStats(new AudioFormat(8000f, 16, 2, true, false), pcm).isEmpty)
    assert(Multimodal.pcmStats(new AudioFormat(8000f, 16, 1, true, true), pcm).isEmpty)
    assert(Multimodal.pcmStats(new AudioFormat(8000f, 16, 1, true, false), pcm).isDefined)
  }

  test("resize: bounded dims, exact nearest-neighbor mapping, identity under bound") {
    // raster-level exactness, no Spark: resized(x,y) == source(x*w/rw, y*h/rh)
    val img = Multimodal.decodePng(Multimodal.renderPng(7L, 16, 8)).get
    val small = Multimodal.decodePng(
      Multimodal.encodePng(Multimodal.resizeRaster(img, Multimodal.ResizeMaxSide))).get
    assert(small.getWidth == 8 && small.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 8)
      assert(small.getRGB(x, y) == img.getRGB(x * 16 / 8, y * 8 / 4))
    // already-small payloads pass through byte-identical (no re-encode)
    val tiny = Multimodal.renderPng(9L, 4, 3)
    import spark.implicits._
    val kept = Multimodal.resizeAll(
      spark.createDataset(Seq(Multimodal.Media(9L, "srcA", tiny))), Multimodal.ResizeMaxSide)
      .collect()(0)
    assert(kept.payload.sameElements(tiny))
    // fixture-wide: every resized payload decodes within bounds
    val meta = Multimodal.decodeAll(
      Multimodal.resizeAll(Multimodal.pngPayloads(spark, sf), Multimodal.ResizeMaxSide)).collect()
    assert(meta.length == Tables.documents(spark, sf).count())
    assert(meta.forall(d =>
      d.width >= 1 && d.width <= Multimodal.ResizeMaxSide &&
      d.height >= 1 && d.height <= Multimodal.ResizeMaxSide))
  }

  test("frame sampling emits `frames` rows per doc with valid bytes") {
    val frames = Multimodal.frameSample(Multimodal.withPayload(spark, sf), 4).collect()
    val perDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.values.forall(_.length == 4))
    assert(frames.forall { r =>
      val b = r.getAs[Int]("byte_value"); b >= 0 && b <= 255
    })
  }

  test("frame sampling survives empty and short payloads") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, ""), (2L, "ab"), (3L, "abcdefgh"))
      .toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("binary").as("payload"))
    val frames = Multimodal.frameSample(df, 4).collect()
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap
    // empty payload: zero rows (not a sequence-bounds crash);
    // short payload: one row per byte; full payload: `frames` rows
    assert(byDoc.getOrElse(1L, 0) == 0)
    assert(byDoc(2L) == 2)
    assert(byDoc(3L) == 4)
  }

  test("funnel stages match a per-user linear scan and are monotone") {
    import org.apache.spark.sql.functions.col
    val events = Tables.events(spark, sf)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val stages = EventOps.FunnelStages
    var reached = Array(0L, 0L, 0L)
    events.groupBy(_._1).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2))
      var t = Array.fill[Option[Long]](3)(None)
      ordered.foreach { case (_, _, us, tpe) =>
        val i = stages.indexOf(tpe)
        if (i == 0 && t(0).forall(_ > us)) t(0) = Some(us)
        else if (i > 0 && t(i - 1).exists(us > _) && t(i).forall(_ > us)) t(i) = Some(us)
      }
      for (i <- 0 until 3) if (t(i).isDefined) reached(i) += 1
    }
    val rows = EventOps.funnelStages(spark, sf).collect()
    assert(rows.map(_.getAs[String]("event_type")).toSeq == stages)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_users") == reached(i), s"stage ${i + 1}")
    }
    // a funnel can only narrow (the dense fixture retains every user,
    // so equality is legitimate — the ordering constraint is what the
    // local scan above verifies)
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b } && ns.last > 0)
  }

  test("cohort retention: age-0 row per cohort covers all users; actives bounded by cohort size") {
    import org.apache.spark.sql.functions.col
    val rows = EventOps.cohortRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_day").toString)
    // every user appears in their cohort's age-0 row (first-day activity
    // is definitionally day 0), so Σ age-0 users = all users
    val age0 = rows.filter(_.getAs[Long]("age_days") == 0L)
    assert(age0.map(_.getAs[Long]("n_users")).sum ==
      Tables.events(spark, sf).where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id")).distinct().count())
    byCohort.foreach { case (c, rs) =>
      val size = rs.find(_.getAs[Long]("age_days") == 0L)
        .map(_.getAs[Long]("n_users")).getOrElse(0L)
      assert(size > 0, s"cohort $c missing its age-0 row")
      assert(rs.forall(_.getAs[Long]("n_users") <= size),
        s"cohort $c has an age with more actives than members")
      assert(rs.forall(_.getAs[Long]("age_days") >= 0L))
    }
  }

  test("session transitions match a local recompute and count every within-session step") {
    import org.apache.spark.sql.functions.col
    val gapUs = GraftConf.DefaultSessionGap.toLong * 60L * 1000000L
    val events = Tables.events(spark, sf)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = scala.collection.mutable.Map.empty[(String, String), Long]
    events.groupBy(_._1).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2))
      ordered.sliding(2).foreach {
        case Array((_, _, us1, t1), (_, _, us2, t2)) if us2 - us1 <= gapUs =>
          expected((t1, t2)) = expected.getOrElse((t1, t2), 0L) + 1
        case _ =>
      }
    }
    val rows = EventOps.sessionTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
      r.getAs[Long]("n_steps")).toMap == expected.toMap)
    // total steps = Σ_sessions (session length - 1)
    val sessions = EventOps.sessionize(spark, sf).collect()
    val total = sessions.map(_.getAs[Long]("n_events") - 1).sum
    assert(rows.map(_.getAs[Long]("n_steps")).sum == total)
  }
}
