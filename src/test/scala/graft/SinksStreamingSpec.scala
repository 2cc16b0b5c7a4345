package graft

import java.nio.file.Files

import graft.sources.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SinksStreamingSpec extends SparkSpec {

  test("z-order write path: materialized layout skips row groups a partkey sort must read") {
    import graft.operators.LayoutOps
    // sf0.01, not the suite's sf0.001: the curve needs non-degenerate
    // key domains (sf0.001's ~10-value suppkey collapses the y bins)
    val sf01 = "/root/testdata/sf0.01"
    val zDir = Files.createTempDirectory("graft_zlayout").toString
    val pDir = Files.createTempDirectory("graft_players").toString
    // 256 files: the scale-realistic regime where the query box spans
    // many file-sized curve ranges (at 100 TB, files outnumber the box
    // by orders of magnitude; 64 fixture-sized files would make each
    // file as LARGE as the whole box, flattering neither layout)
    LayoutOps.zorderWrite(spark, sf01, zDir, files = 256)
    LayoutOps.singleKeyWrite(spark, sf01, pDir, files = 256)
    // a box predicate over BOTH keys, ~1/8 of each domain, placed inside
    // one curve quadrant (fractions 5/16..7/16) — the multi-column
    // pruning case Z-order exists for
    val li = Tables.lineitem(spark, sf01)
    val Array(dom) = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).collect()
    def frac(lo: Long, hi: Long, num: Long): Long = lo + (hi - lo) * num / 16
    val (pLo, pHi) = (frac(dom.getLong(0), dom.getLong(1), 5), frac(dom.getLong(0), dom.getLong(1), 7))
    val (sLo, sHi) = (frac(dom.getLong(2), dom.getLong(3), 5), frac(dom.getLong(2), dom.getLong(3), 7))
    def boxCount(dir: String): Long = spark.read.parquet(dir)
      .where(col("l_partkey").between(pLo, pHi) && col("l_suppkey").between(sLo, sHi))
      .count()
    // both layouts hold the same data and answer the predicate identically
    assert(boxCount(zDir) == boxCount(pDir))
    assert(boxCount(zDir) == li.where(
      col("l_partkey").between(pLo, pHi) && col("l_suppkey").between(sLo, sHi)).count())
    // footer statistics: what a pruning reader must actually read
    val z = LayoutOps.scanEstimate(spark, zDir, pLo, pHi, sLo, sHi)
    val p = LayoutOps.scanEstimate(spark, pDir, pLo, pHi, sLo, sHi)
    info(s"zorder: $z")
    info(s"partkey-sorted: $p")
    assert(z.rows == p.rows, "layouts must hold identical row counts")
    // the partkey sort prunes partkey-disjoint files but every surviving
    // file spans ~the full suppkey domain; the Z layout keeps both
    // ranges narrow, so it must read strictly fewer rows — at least 2×
    // fewer (measured ~4-8× at fixture scale)
    assert(z.rowsToRead * 2 <= p.rowsToRead,
      s"z-order should at least halve the rows a scan reads: z=$z p=$p")
    assert(z.rowGroupsToRead < p.rowGroupsToRead,
      s"z-order should touch fewer row groups: z=$z p=$p")
  }

  test("pipe-delimited sink/source round-trip preserves rows (S1/S4/S6 parity)") {
    val dir = Files.createTempDirectory("graft_pipe").toString
    // cast to the text-path schema types (parquet linenumber is int64,
    // the pipe schema says int32) so the round-trip compares equal
    val cols = Tables.lineitemSchema.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
    val out = Tables.lineitem(spark, sf).select(cols.toSeq: _*).limit(500)
    Tables.writePipeDelimited(out, dir)
    val back = Tables.readPipeDelimited(spark, dir, Tables.lineitemSchema)
    assert(back.count() == 500)
    val a = out.orderBy("l_orderkey", "l_linenumber").collect()
    val b = back.orderBy("l_orderkey", "l_linenumber").collect()
    assert(a.sameElements(b))
  }

  test("gzip sink writes compressed part files (S5 parity)") {
    val dir = Files.createTempDirectory("graft_gz").toFile
    Tables.writeGzip(Tables.region(spark, sf), dir.toString)
    val parts = dir.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".gz")))
  }

  test("jsonl sink/source round-trip preserves the curated-document export") {
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    val out = graft.streaming.DocStream.curateStream(Tables.documents(spark, sf))
    Tables.writeJsonl(out, dir.toString)
    // gzip'd one-object-per-line part files, schema-pinned read-back
    val parts = dir.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".json.gz")))
    val back = Tables.readJsonl(spark, dir.toString, out.schema)
    val a = out.orderBy("doc_id").collect()
    val b = back.select(out.columns.map(col).toSeq: _*).orderBy("doc_id").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("malformed rows become nulls under the typed pipe schema (P4 parity)") {
    val dir = Files.createTempDirectory("graft_bad").toString
    Files.writeString(java.nio.file.Path.of(dir, "data.csv"),
      "1|2|3|4|5.0|6.0|0.1|0.0|N|O|1996-01-02 00:00:00\n" +
        "x|2|3|4|not_a_number|6.0|0.1|0.0|N|O|1996-01-02 00:00:00\n" +
        "2|2|3|4|5.0|6.0|0.1|0.0|N|O|bad_date\n")
    val df = Tables.readPipeDelimited(spark, dir, Tables.lineitemSchema)
    assert(df.count() == 3)
    // HiveQL-style: unparseable cells are null, the row survives until filtered
    assert(df.where(col("l_orderkey").isNotNull && col("l_quantity").isNotNull
      && col("l_shipdate").isNotNull).count() == 1)
  }

  test("decimal/char/varchar/date ride the pipe path (store DDL parity)") {
    val dir = Files.createTempDirectory("graft_store").toString
    Files.writeString(java.nio.file.Path.of(dir, "stores.dat"),
      "1|AAAAAAAABAAAAAAA|ok store|7245|0.35|1997-03-13\n" +
        "2|AAAAAAAACAAAAAAA|big store|30000|12.34|2001-01-01\n" +
        "3|AAAAAAAADAAAAAAA|bad decimal|100|99999.99|1999-05-05\n" + // overflows DECIMAL(5,2)
        "4|AAAAAAAAEAAAAAAA|bad date|100|1.00|not_a_date\n")
    val df = Tables.readPipeDelimited(spark, dir, Tables.storeSchema)
    import org.apache.spark.sql.types._
    assert(df.schema("s_tax_percentage").dataType == DecimalType(5, 2))
    assert(df.schema("s_rec_start_date").dataType == DateType)
    assert(df.count() == 4)
    // PERMISSIVE: the unparseable decimal and date become nulls, rows survive
    val good = df.where(col("s_tax_percentage").isNotNull && col("s_rec_start_date").isNotNull)
    assert(good.count() == 2)
    val r = good.where(col("s_store_sk") === 2).collect()(0)
    assert(r.getAs[java.math.BigDecimal]("s_tax_percentage").toString == "12.34")
    assert(r.getAs[java.sql.Date]("s_rec_start_date").toString == "2001-01-01")
    // catalog DDL carries the declared CHAR/VARCHAR widths
    Tables.createExternalPipeTable(spark, "store_ext", dir, Tables.storeDdlSchema)
    assert(spark.sql("DESCRIBE store_ext").collect()
      .exists(row => row.getString(0) == "s_store_id" && row.getString(1) == "char(16)"))
    val viaSql = spark.sql(
      "SELECT s_store_id, s_tax_percentage FROM store_ext WHERE s_store_sk = 1").collect()(0)
    assert(viaSql.getString(0) == "AAAAAAAABAAAAAAA")
    assert(viaSql.getDecimal(1).toString == "0.35")
    spark.sql("DROP TABLE store_ext")
  }

  test("external-table DDL registers a catalog table over pipe text (S6 parity)") {
    val dir = Files.createTempDirectory("graft_ext").toString
    val cols = Tables.lineitemSchema.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
    Tables.writePipeDelimited(Tables.lineitem(spark, sf).select(cols.toSeq: _*).limit(100), dir)
    Tables.createExternalPipeTable(spark, "lineitem_ext", dir, Tables.lineitemSchema)
    assert(spark.sql("SELECT count(*) FROM lineitem_ext").collect()(0).getLong(0) == 100)
    assert(spark.sql("SELECT sum(l_quantity) FROM lineitem_ext").collect()(0).getDouble(0) > 0)
    spark.sql("DROP TABLE lineitem_ext")
  }

  test("partitioned parquet sink prunes partitions at the catalog, not post-scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.writePartitioned(
      Tables.documents(spark, sf).select(col("doc_id"), col("lang"), col("source")),
      dir, "lang", "doc_id")
    // layout: one directory per lang value
    val langDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(langDirs.forall(_.startsWith("lang=")), langDirs.mkString(","))
    val read = spark.read.parquet(dir)
    // round trip preserves rows
    assert(read.count() == Tables.documents(spark, sf).count())
    // the lang filter must land in PartitionFilters (pruned before any
    // file opens), NOT PushedFilters/post-scan Filter
    val plan = read.where(col("lang") === "en").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter not pruned at partition level:\n$plan")
    val en = read.where(col("lang") === "en").count()
    val enBatch = Tables.documents(spark, sf).where(col("lang") === "en").count()
    assert(en == enBatch)
  }

  test("maxPartitionBytes controls scan parallelism (S2 parity)") {
    val defaultParts = Tables.lineitem(spark, sf).rdd.getNumPartitions
    val manyParts = Tables.withMaxPartitionBytes(spark, 16 * 1024) {
      Tables.lineitem(spark, sf).rdd.getNumPartitions
    }
    assert(manyParts > defaultParts)
  }

  test("the declarative spark.sql path runs the oracle's own SQL (Hive-CLI parity)") {
    graft.sources.Tables.registerAllViews(spark, sf)
    val viaSql = spark.sql(graft.operators.RefQueries.q1aSql).collect()
    val viaDf = graft.operators.RefQueries.q1aTopRevenue(spark, sf).collect()
    assert(viaSql.map(r => (r.getLong(0), r.getDouble(1)))
      .sameElements(viaDf.map(r => (r.getLong(0), r.getDouble(1)))))
  }

  test("streaming hourly counts match the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.Event]
    val events = (0 until 100).map { i =>
      EventStream.Event(i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 5}%02d:10:00"),
        i % 7, if (i % 2 == 0) "view" else "click", 1.0)
    }
    input.addData(events)
    val q = EventStream.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly_test").outputMode("complete").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("hourly_test")
      .orderBy("window_start", "event_type").collect()
    val batch = EventStream.hourlyCounts(events.toDF())
      .orderBy("window_start", "event_type").collect()
    assert(streamed.sameElements(batch))
    assert(streamed.map(_.getAs[Long]("n_events")).sum == 100)
  }

  test("file-source stream over the events fixture matches the batch aggregate") {
    val dir = Files.createTempDirectory("graft_stream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/events.parquet"),
      java.nio.file.Path.of(dir, "events.parquet"))
    val q = EventStream.hourlyCounts(EventStream.readEventsStream(spark, dir))
      .writeStream.format("memory").queryName("file_stream_test").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("file_stream_test")
      .orderBy("window_start", "event_type").collect()
    val batch = EventStream.hourlyCounts(Tables.events(spark, sf))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("stream-stream interval join (attribution) matches the batch chunk-join exactly") {
    val dir = Files.createTempDirectory("graft_ssjoin").toString
    Files.copy(java.nio.file.Path.of(s"$sf/events.parquet"),
      java.nio.file.Path.of(dir, "events.parquet"))
    val q = EventStream.attributionStream(EventStream.readEventsStream(spark, dir))
      .writeStream.format("memory").queryName("attr_stream_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("attr_stream_test")
      .orderBy("click_id", "view_id").collect()
    val batch = graft.operators.EventOps.attributionWindow(spark, sf).collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch))
    // every pair respects the interval bound; bound inclusive at 0
    assert(streamed.forall { r =>
      val g = r.getAs[Long]("gap_us")
      g >= 0 && g <= graft.operators.EventOps.AttributionWindowSec * 1000000L
    })
  }

  test("trailing anomaly ratio over STREAM-landed hourly counts equals the batch query") {
    val dir = Files.createTempDirectory("graft_trailstream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/events.parquet"),
      java.nio.file.Path.of(dir, "events.parquet"))
    val q = EventStream.hourlyCounts(EventStream.readEventsStream(spark, dir))
      .writeStream.format("memory").queryName("trail_stream_test").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    // continuous-land / periodic-tail: the same window tail the batch
    // query uses, run over the stream-accumulated hourly table
    val streamed = graft.operators.EventOps
      .trailingRatioFromHourly(spark.table("trail_stream_test")).collect()
    val batch = graft.operators.EventOps.trailingEventRatio(spark, sf).collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("streaming ingest-dedup drops redelivered events within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.Event]
    def ev(id: Long, t: String) =
      EventStream.Event(id, java.sql.Timestamp.valueOf(t), 1L, "view", 1.0)
    val q = EventStream.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      input.addData(Seq(ev(1, "2024-01-01 00:00:00"), ev(2, "2024-01-01 00:01:00"),
        ev(1, "2024-01-01 00:00:00"))) // duplicate within the batch
      q.processAllAvailable()
      // redelivery in a LATER batch must also be dropped (state held)
      input.addData(Seq(ev(2, "2024-01-01 00:01:00"), ev(3, "2024-01-01 00:05:00")))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_test").collect().map(_.getAs[Long]("event_id")).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)))
  }

  test("ingest-dedup composed with the stream-stream join: redelivery yields no duplicate pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.Event]
    def ev(id: Long, t: String, typ: String) =
      EventStream.Event(id, java.sql.Timestamp.valueOf(t), 7L, typ, 1.0)
    // chained stateful operators: dropDuplicatesWithinWatermark THEN the
    // interval self-join — the at-least-once feed shape end-to-end
    val q = EventStream.attributionStream(EventStream.dedupEvents(input.toDF()))
      .writeStream.format("memory").queryName("dedup_join_test")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        ev(1, "2024-01-01 00:00:00", "view"),
        ev(2, "2024-01-01 01:00:00", "click"),
        ev(2, "2024-01-01 01:00:00", "click"))) // same-batch redelivery
      q.processAllAvailable()
      // later-batch redelivery of BOTH sides must not re-emit the pair
      input.addData(Seq(ev(1, "2024-01-01 00:00:00", "view"),
        ev(2, "2024-01-01 01:00:00", "click"),
        ev(3, "2024-01-01 02:00:00", "click")))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("dedup_join_test").collect()
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("view_id")))
    // view 1 is within the 6h window of both clicks; each pair exactly once
    assert(pairs.sorted.sameElements(Array((2L, 1L), (3L, 1L))))
  }

  test("streaming PII redaction matches the oracle-verified batch text_redact") {
    import graft.streaming.DocStream
    val dir = Files.createTempDirectory("graft_redactstream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/documents.parquet"),
      java.nio.file.Path.of(dir, "documents.parquet"))
    val q = DocStream.redactStream(DocStream.readDocsStream(spark, dir))
      .writeStream.format("memory").queryName("doc_redact_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("doc_redact_test").orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_emails"),
        r.getAs[Long]("n_longnums"), r.getAs[Long]("redacted_hash")))
    val batch = graft.operators.TextAnalysis.textRedact(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_emails"),
        r.getAs[Long]("n_longnums"), r.getAs[Long]("redacted_hash")))
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("streaming document curation matches the batch filter, and dedups redelivery") {
    import graft.streaming.DocStream
    val dir = Files.createTempDirectory("graft_docstream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/documents.parquet"),
      java.nio.file.Path.of(dir, "documents.parquet"))
    // stateless curation: streamed result == the same function on the batch frame
    val q = DocStream.curateStream(DocStream.readDocsStream(spark, dir))
      .writeStream.format("memory").queryName("doc_curate_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("doc_curate_test").orderBy("doc_id").collect()
    val batch = DocStream.curateStream(Tables.documents(spark, sf)).orderBy("doc_id").collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch))
    // semantics match the oracle-verified batch operators
    val quality = graft.operators.TextAnalysis.qualityScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    streamed.foreach { r =>
      assert(r.getAs[Double]("quality") == quality(r.getAs[Long]("doc_id")))
      assert(graft.operators.Curation.LangAllow.contains(r.getAs[String]("lang")))
    }
    // redelivery: the same file landing twice dedups down to one copy
    // per content hash within the watermark
    Files.copy(java.nio.file.Path.of(s"$sf/documents.parquet"),
      java.nio.file.Path.of(dir, "documents_redelivered.parquet"))
    val q2 = DocStream.dedupedStream(DocStream.curateStream(DocStream.readDocsStream(spark, dir)))
      .writeStream.format("memory").queryName("doc_dedup_test").outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val deduped = spark.table("doc_dedup_test").collect()
    val distinctHashes = batch.map(r =>
      (r.getAs[Long]("content_hash"), r.getAs[Long]("content_hash_b"))).distinct.length
    assert(deduped.length == distinctHashes,
      s"expected $distinctHashes unique contents, got ${deduped.length}")
  }

  test("streaming signatures equal the oracle-verified batch signatures") {
    import graft.streaming.DocStream
    import graft.operators.DedupOps
    val dir = Files.createTempDirectory("graft_sigstream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/documents.parquet"),
      java.nio.file.Path.of(dir, "documents.parquet"))
    val q = DocStream.signatureStream(DocStream.readDocsStream(spark, dir))
      .writeStream.format("memory").queryName("doc_sig_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("doc_sig_test").orderBy("doc_id").collect()
    assert(streamed.nonEmpty)
    // streamed == the same function on the batch frame (stateless)
    val batch = DocStream.signatureStream(Tables.documents(spark, sf))
      .toDF().orderBy("doc_id").collect()
    assert(streamed.sameElements(batch))
    // simhash halves equal the batch operator the DuckDB oracle verifies
    val simBatch = DedupOps.simhashSignatures(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    streamed.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      simBatch.get(id).foreach { case (lo, hi) =>
        assert(r.getAs[Long]("simhash_lo") == lo && r.getAs[Long]("simhash_hi") == hi,
          s"doc $id: streaming simhash diverged from the batch aggregator")
      }
      assert(simBatch.contains(id) == !r.isNullAt(r.fieldIndex("simhash_lo")))
    }
    // minhash mins equal the batch signature frame (m0..m11)
    val mhBatch = DedupOps.signatures(spark, sf, keepHs = false).collect()
      .map(r => r.getLong(0) -> (0 until DedupOps.NumHashes).map(i => r.getAs[Long](s"m$i"))).toMap
    streamed.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      mhBatch.get(id).foreach { mins =>
        assert(r.getSeq[Long](r.fieldIndex("minhash")) == mins,
          s"doc $id: streaming minhash diverged from the batch signatures")
      }
      assert(mhBatch.contains(id) == !r.isNullAt(r.fieldIndex("minhash")))
    }
    // the periodic-batch half of the architecture: banding the STORED
    // signature rows yields the same candidate pairs as the text path
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val fromSigs = DedupOps.minhashCandidatesFromSignatures(
      DocStream.signatureStream(Tables.documents(spark, sf)).toDF()).collect()
    assert(pairs(fromSigs) == pairs(DedupOps.minhashCandidates(spark, sf).collect()),
      "signature-table banding must reproduce the text path's candidates")
    // ... and the SimHash half: banding the stored halves yields the
    // same near-dup pairs as the text path (exact retrieval either way)
    val simFromSigs = DedupOps.simhashNearDupsFromSignatures(
      DocStream.signatureStream(Tables.documents(spark, sf)).toDF().localCheckpoint(true))
      .collect()
    assert(pairs(simFromSigs) == pairs(DedupOps.simhashNearDups(spark, sf).collect()),
      "signature-table simhash banding must reproduce the text path's pairs")
  }

  test("online LSH band join emits the batch candidate pairs across micro-batches") {
    import graft.streaming.DocStream
    import graft.operators.DedupOps
    // two files → two triggers: pairs spanning the halves exist only if
    // bucket state survives across micro-batches
    val dir = Files.createTempDirectory("graft_candstream").toString
    val docs = Tables.documents(spark, sf)
    Seq(0, 1).foreach { half =>
      val tmp = Files.createTempDirectory(s"graft_cand_half$half").toString
      docs.where(col("doc_id") % 2 === half).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, java.nio.file.Path.of(dir, s"half$half.parquet"))
    }
    val q = DocStream.candidateStream(
        DocStream.signatureStream(DocStream.readDocsStream(spark, dir)).toDF())
      .writeStream.format("memory").queryName("cand_stream_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // distinct pairs with shared-band counts == the oracle-verified batch
    // operator (no sf0.001 bucket nears the default cap, so the capped
    // streaming semantics coincide with the batch retroactive drop)
    val streamed = spark.table("cand_stream_test").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).distinct
      .groupBy(_._1).map { case (p, g) => (p._1, p._2, g.size.toLong) }.toSeq.sorted
    val batch = DedupOps.minhashCandidates(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed ${streamed.length} pairs vs batch ${batch.length}")
  }

  test("stream-stream join recovers its JOIN STATE across a restart (cross-boundary matches)") {
    import org.apache.spark.sql.expressions.Window
    val inDir = Files.createTempDirectory("graft_ssrec_in").toString
    val outDir = Files.createTempDirectory("graft_ssrec_out").toString
    val ckpt = Files.createTempDirectory("graft_ssrec_ckpt").toString
    val raw = Tables.events(spark, sf)
      .select(col("event_id"), expr("unix_micros(ts) * 1000").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val n = raw.count()
    val withRn = raw.withColumn("rn",
      row_number().over(Window.orderBy(col("ts"), col("event_id"))))
    def writeChunk(lo: Long, hi: Long, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_ssrec_chunk").toString
      withRn.where(col("rn") > lo && col("rn") <= hi).drop("rn")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Path.of(inDir, name))
    }
    def runStream(): Unit = {
      val q = EventStream.attributionStream(EventStream.readEventsStream(spark, inDir))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", outDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    // time-ordered halves: views buffered in join state during phase 1
    // must meet clicks arriving only after the restart
    writeChunk(0, n / 2, "f1.parquet")
    runStream() // phase 1, then the query is killed
    writeChunk(n / 2, n, "f2.parquet")
    runStream() // recovery: state restored from the checkpoint
    val streamed = spark.read.parquet(outDir)
      .select("click_id", "view_id", "user_id", "gap_us").collect()
    val batch = graft.operators.EventOps.attributionWindow(spark, sf).collect()
    assert(streamed.length == batch.length, "no loss, no duplicates across restart")
    assert(streamed.map(_.toString).sorted.sameElements(batch.map(_.toString).sorted))
  }

  test("streaming checkpoint recovery resumes exactly-once after a restart") {
    import org.apache.spark.sql.expressions.Window
    val inDir = Files.createTempDirectory("graft_rec_in").toString
    val outDir = Files.createTempDirectory("graft_rec_out").toString
    val ckpt = Files.createTempDirectory("graft_rec_ckpt").toString

    // the events fixture re-encoded in the file-stream's nano-long
    // shape, split into time-ordered thirds so each restart only ever
    // sees strictly-later data (no late-arrival ambiguity in the test)
    val raw = Tables.events(spark, sf)
      .select(col("event_id"), expr("unix_micros(ts) * 1000").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val n = raw.count()
    val withRn = raw.withColumn("rn",
      row_number().over(Window.orderBy(col("ts"), col("event_id"))))
    def writeChunk(lo: Long, hi: Long, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_rec_chunk").toString
      withRn.where(col("rn") > lo && col("rn") <= hi).drop("rn")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Path.of(inDir, name))
    }
    def runStream(): Unit = {
      val q = EventStream.hourlyCounts(EventStream.readEventsStream(spark, inDir))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", outDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    writeChunk(0, n / 3, "f1.parquet")
    writeChunk(n / 3, 2 * n / 3, "f2.parquet")
    runStream() // phase 1, then the query is killed

    writeChunk(2 * n / 3, n, "f3.parquet")
    // far-future sentinel pushes the watermark past every real window so
    // the append-mode sink flushes them all after the restart
    val maxTs = raw.agg(max(col("ts"))).collect()(0).getLong(0)
    spark.range(1).select(lit(-1L).as("event_id"),
        lit(maxTs + 10L * 24 * 3600 * 1000000000L).as("ts"),
        lit(0L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"), lit(null).cast("string").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$inDir-sent")
    val sent = new java.io.File(s"$inDir-sent").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(sent.toPath, java.nio.file.Path.of(inDir, "f4.parquet"))
    runStream() // phase 2: recovery from the checkpoint

    val streamed = spark.read.parquet(outDir).where(col("event_type") =!= "sentinel")
      .orderBy("window_start", "event_type").collect()
    val batch = EventStream.hourlyCounts(Tables.events(spark, sf))
      .orderBy("window_start", "event_type").collect()
    // exactly-once: every window exactly once — a replayed f1/f2 batch
    // would duplicate rows, a lost state store would drop or undercount
    assert(streamed.length == batch.length,
      s"window count ${streamed.length} != batch ${batch.length}")
    assert(streamed.sameElements(batch))
  }

  test("streaming decontamination: matched rows equal the batch semi-join; batch tail completes the chain") {
    import graft.streaming.DocStream
    import graft.operators.Decontamination
    import org.apache.spark.sql.functions.{broadcast, col}
    val dir = Files.createTempDirectory("graft_deconstream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/documents.parquet"),
      java.nio.file.Path.of(dir, "documents.parquet"))
    val docs = Tables.documents(spark, sf)
    val evalSh = Decontamination.shingleRows(
      docs.where(col("source") === Decontamination.EvalSource))
    val evalHashes = evalSh.select(col("h")).distinct()
    val q = DocStream.contaminationStream(
        DocStream.readDocsStream(spark, dir)
          .where(col("source") =!= Decontamination.EvalSource), evalHashes)
      .writeStream.format("memory").queryName("decon_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("decon_test")
    val streamedRows = streamed.collect()
      .map(r => (r.getAs[Long]("corpus_doc"), r.getAs[Long]("h"))).sorted
    val batchRows = Decontamination.shingleRows(
        docs.where(col("source") =!= Decontamination.EvalSource))
      .join(evalHashes, "h")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h"))).sorted
    assert(streamedRows.nonEmpty && streamedRows.sameElements(batchRows))
    // full chain: the periodic batch tail over the STREAMED rows equals
    // the oracle-verified end-to-end batch query
    val tail = Decontamination.overlapFromMatched(streamed, evalSh, broadcast)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val full = Decontamination.evalOverlap(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tail.sameElements(full))
  }

  test("streaming sessionization closes sessions on gap (flatMapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.Event]
    def ev(id: Long, user: Long, t: String) =
      EventStream.Event(id, java.sql.Timestamp.valueOf(t), user, "view", 1.0)
    // user 1: two bursts 2h apart -> first session must close when the
    // second burst arrives in a later batch
    input.addData(Seq(
      ev(1, 1, "2024-01-01 00:00:00"), ev(2, 1, "2024-01-01 00:10:00"),
      ev(3, 2, "2024-01-01 00:00:00")))
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      input.addData(Seq(ev(4, 1, "2024-01-01 02:30:00")))
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("sessions_test").collect()
    assert(sessions.exists { r =>
      r.getAs[Long]("user_id") == 1 && r.getAs[Long]("n_events") == 2
    }, s"expected user 1's first 2-event session to close; got ${sessions.mkString(", ")}")
  }

  test("streaming sessionization survives a file batch whose events predate the watermark") {
    import spark.implicits._
    // the sf1 replay shape: a directory whose FILE ORDER is not TIME
    // order (the file source batches by modification time). Batch 1 =
    // the file with NEW timestamps → its completion advances the
    // watermark; batch 2 = the file with OLD timestamps. The file
    // source's late filter lags the eviction watermark by one batch,
    // so batch 2's rows REACH the state function while the current
    // watermark is far ahead — registering lastUs+gap as a timeout
    // would throw (past timestamp); the session must close immediately
    // instead.
    val dir = Files.createTempDirectory("graft_ooo_files").toString
    def writeAs(name: String, rows: Seq[(Long, String, Long)], modMs: Long): Unit = {
      val tmp = Files.createTempDirectory("graft_ooo_part").toString
      rows.toDF("event_id", "tss", "user_id")
        .selectExpr("event_id", "CAST(tss AS TIMESTAMP) AS ts", "user_id",
          "'view' AS event_type", "CAST(1.0 AS DOUBLE) AS value", "'' AS props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = java.nio.file.Path.of(dir, name)
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(modMs))
    }
    val t0 = System.currentTimeMillis()
    writeAs("new.parquet", Seq((1L, "2024-01-02 00:00:00", 1L)), t0 - 60000)
    writeAs("old.parquet", Seq((2L, "2024-01-01 00:00:00", 2L),
      (3L, "2024-01-01 00:05:00", 2L)), t0)
    val src = EventStream.readEventsStream(spark, dir, maxFilesPerTrigger = 1)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Event]
    val q = EventStream.sessionize(src)
      .writeStream.format("memory").queryName("late_sessions_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query failed: ${q.exception}")
    } finally q.stop()
    val sessions = spark.table("late_sessions_test").collect()
    assert(sessions.exists { r =>
      r.getAs[Long]("user_id") == 2 && r.getAs[Long]("n_events") == 2
    }, s"expected user 2's behind-watermark session to close immediately; got ${sessions.mkString(", ")}")
  }

  test("a session from the FIRST batch (watermark still 0) flushes once the watermark passes it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.Event]
    def ev(id: Long, user: Long, t: String) =
      EventStream.Event(id, java.sql.Timestamp.valueOf(t), user, "view", 1.0)
    // batch 1 runs with watermark 0 — the timeout must be registered
    // anyway, or user 3 (never seen again) holds state forever and the
    // session never reaches the sink
    input.addData(Seq(ev(1, 3, "2024-01-01 00:00:00"), ev(2, 3, "2024-01-01 00:05:00")))
    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("firstbatch_sessions_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      input.addData(Seq(ev(3, 99, "2024-02-01 00:00:00"))) // watermark push
      q.processAllAvailable()
      input.addData(Seq(ev(4, 99, "2024-03-01 00:00:00"))) // fire timeouts
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("firstbatch_sessions_test").collect()
    assert(sessions.exists { r =>
      r.getAs[Long]("user_id") == 3 && r.getAs[Long]("n_events") == 2
    }, s"expected user 3's first-batch session to flush on timeout; got ${sessions.mkString(", ")}")
  }

  test("sessionizer state survives a checkpoint restart (a session spans the kill boundary)") {
    import spark.implicits._
    // the flatMapGroupsWithState analogue of the join/agg recovery
    // specs above: user 1's session STARTS before the kill and its
    // third event lands only after the restart — it can merge into one
    // 3-event session only if the recovered SessionState carries
    // lastUs across the checkpoint. Without recovery the post-restart
    // event would open a fresh session and no 3-event session exists.
    val inDir = Files.createTempDirectory("graft_sessrec_in").toString
    val outDir = Files.createTempDirectory("graft_sessrec_out").toString
    val ckpt = Files.createTempDirectory("graft_sessrec_ckpt").toString
    def writeAs(name: String, rows: Seq[(Long, String, Long)], modMs: Long): Unit = {
      val tmp = Files.createTempDirectory("graft_sessrec_part").toString
      rows.toDF("event_id", "tss", "user_id")
        .selectExpr("event_id", "CAST(tss AS TIMESTAMP) AS ts", "user_id",
          "'view' AS event_type", "CAST(1.0 AS DOUBLE) AS value", "'' AS props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dst = java.nio.file.Path.of(inDir, name)
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(modMs))
    }
    def runStream(): Unit = {
      val src = EventStream.readEventsStream(spark, inDir, maxFilesPerTrigger = 1)
        .where(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[EventStream.Event]
      val q = EventStream.sessionize(src)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", outDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    val t0 = System.currentTimeMillis()
    writeAs("f1.parquet", Seq(
      (1L, "2024-01-01 00:00:00", 1L), (2L, "2024-01-01 00:10:00", 1L),
      (3L, "2024-01-01 00:00:00", 2L), (4L, "2024-01-01 00:05:00", 2L)), t0 - 4000)
    runStream() // phase 1, then the query is killed
    // 00:20 is within the 30-min gap of user 1's RECOVERED lastUs
    // (00:10); 02:00 exceeds the gap for both users and closes their
    // first sessions on the row path
    writeAs("f2.parquet", Seq(
      (5L, "2024-01-01 00:20:00", 1L), (6L, "2024-01-01 02:00:00", 1L),
      (7L, "2024-01-01 02:00:00", 2L)), t0 - 2000)
    // far-future sentinel advances the watermark so the 02:00 tail
    // sessions time out and flush to the append sink
    writeAs("f3.parquet", Seq((8L, "2024-02-01 00:00:00", 99L)), t0)
    runStream() // phase 2: recovery from the checkpoint
    val sessions = spark.read.parquet(outDir)
      .select("user_id", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start").toString,
        r.getAs[java.sql.Timestamp]("session_end").toString, r.getAs[Long]("n_events"))).toSet
    assert(sessions == Set(
      (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:20:00.0", 3L),
      (1L, "2024-01-01 02:00:00.0", "2024-01-01 02:00:00.0", 1L),
      (2L, "2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0", 2L),
      (2L, "2024-01-01 02:00:00.0", "2024-01-01 02:00:00.0", 1L)),
      s"got $sessions")
  }

  test("streaming audio decode matches the oracle-verified batch multimodal_audio") {
    import graft.streaming.MediaStream
    import graft.operators.Multimodal
    // land the generated WAV payloads as a parquet file, replay as a stream
    val dir = Files.createTempDirectory("graft_mediastream").toString
    Multimodal.wavPayloads(spark, sf).toDF().write.parquet(s"$dir/in")
    val q = MediaStream.audioStatsStream(MediaStream.readMediaStream(spark, s"$dir/in"))
      .writeStream.format("memory").queryName("media_stream_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("media_stream_test").orderBy("doc_id").collect()
      .map(_.toString).toSeq
    val batch = Multimodal.multimodalAudio(spark, sf).collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming video decode matches the oracle-verified batch multimodal_video") {
    import graft.streaming.MediaStream
    import graft.operators.Multimodal
    val dir = Files.createTempDirectory("graft_videostream").toString
    Multimodal.videoPayloads(spark, sf).toDF().write.parquet(s"$dir/in")
    val q = MediaStream.videoFramesStream(MediaStream.readMediaStream(spark, s"$dir/in"))
      .writeStream.format("memory").queryName("video_stream_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("video_stream_test").orderBy("doc_id", "frame_no")
      .collect().map(_.toString).toSeq
    val batch = Multimodal.multimodalVideo(spark, sf).collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming media quarantine equals the batch reject set across a checkpoint restart") {
    import graft.streaming.MediaStream
    import graft.operators.Multimodal
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft_mq_in").toString
    val outDir = Files.createTempDirectory("graft_mq_out").toString
    val ckpt = Files.createTempDirectory("graft_mq_ckpt").toString
    // poison ~3/7 of the corpus deterministically: truncated payload,
    // garbage-overwritten header, null payload — the three arrival
    // shapes of a corrupt media feed
    def poison(m: Multimodal.Media): Multimodal.Media = (m.doc_id % 7) match {
      case 0 => Multimodal.Media(m.doc_id, m.source, m.payload.take(10))
      case 1 => Multimodal.Media(m.doc_id, m.source,
        "not a riff header".getBytes ++ m.payload.drop(17))
      case 2 => Multimodal.Media(m.doc_id, m.source, null)
      case _ => m
    }
    val media = Multimodal.wavPayloads(spark, sf).map(poison)
    // batch ground truth: rejects ∪ decoded EXACTLY partition the feed
    val batchRejects = Multimodal.audioRejects(media).collect()
    val decoded = Multimodal.audioStats(media).collect()
    assert(batchRejects.nonEmpty && decoded.nonEmpty)
    assert(batchRejects.length + decoded.length == media.count(),
      "every payload must be decoded or quarantined, never both/neither")
    assert(batchRejects.map(_.doc_id).toSet.intersect(decoded.map(_.doc_id).toSet).isEmpty)
    assert(batchRejects.map(_.reason).toSet ==
      Set("wav_decode_failed", "null_payload"))
    // stream the feed in two halves with a kill + checkpoint recovery
    // between them: quarantine rows must survive exactly-once
    val ids = media.map(_.doc_id).collect().sorted
    val mid = ids(ids.length / 2)
    def writeChunk(lo: Boolean, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_mq_chunk").toString
      media.filter(m => (m.doc_id < mid) == lo).toDF()
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Path.of(inDir, name))
    }
    def runStream(): Unit = {
      val q = MediaStream.audioQuarantineStream(MediaStream.readMediaStream(spark, inDir))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", outDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    writeChunk(lo = true, "f1.parquet")
    runStream() // phase 1, then the query is killed
    writeChunk(lo = false, "f2.parquet")
    runStream() // recovery from the checkpoint
    val streamed = spark.read.parquet(outDir).collect().map(_.toString).sorted
    assert(streamed.sameElements(batchRejects.map(r =>
      org.apache.spark.sql.Row(r.doc_id, r.source, r.n_bytes, r.reason).toString).sorted),
      "streamed quarantine must equal the batch reject set, no loss, no duplicates")
    // video container side: same contract, batch-level
    def poisonVideo(m: Multimodal.Media): Multimodal.Media = (m.doc_id % 5) match {
      case 0 => Multimodal.Media(m.doc_id, m.source, m.payload.take(4))
      case 1 => Multimodal.Media(m.doc_id, m.source, null)
      case _ => m
    }
    val video = Multimodal.videoPayloads(spark, sf).map(poisonVideo)
    val vRejects = Multimodal.videoRejects(video).collect()
    val vDecodedDocs = Multimodal.videoFrames(video).collect().map(_.doc_id).distinct
    assert(vRejects.nonEmpty && vDecodedDocs.nonEmpty)
    assert(vRejects.length + vDecodedDocs.length == video.count())
    assert(vRejects.map(_.reason).toSet == Set("video_parse_failed", "null_payload"))
  }

  test("streaming kNN labeling matches the oracle-verified batch knn_label_ivf") {
    import graft.streaming.EmbedStream
    // file-source replay of the embeddings fixture -> served predictions
    val dir = Files.createTempDirectory("graft_knnstream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/embeddings.parquet"),
      java.nio.file.Path.of(dir, "embeddings.parquet"))
    val q = EmbedStream.labelStream(
        EmbedStream.readEmbeddingsStream(spark, dir), spark, sf)
      .writeStream.format("memory").queryName("knn_stream_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("knn_stream_test").collect()
      .map(r => (r.getAs[Long]("query_id"),
        (r.getAs[Int]("pred_label"), r.getAs[Long]("n_votes")))).toMap
    val batch = graft.operators.Similarity.knnLabelIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"),
        (r.getAs[Int]("pred_label"), r.getAs[Long]("n_votes")))).toMap
    assert(streamed == batch,
      s"streamed ${streamed.size} predictions != batch ${batch.size}")
    assert(batch.nonEmpty)
  }

  test("orc and zstd-parquet sinks round-trip the documents table exactly") {
    val docs = Tables.documents(spark, sf)
    val expected = docs.orderBy("doc_id").collect().map(_.toString).toSeq
    val orcDir = Files.createTempDirectory("graft_orc").toString
    Tables.writeOrc(docs, orcDir)
    assert(Tables.readOrc(spark, orcDir).orderBy("doc_id")
      .collect().map(_.toString).toSeq == expected)
    val zDir = Files.createTempDirectory("graft_zstd").toString
    Tables.writeParquetZstd(docs, zDir)
    assert(spark.read.parquet(zDir).orderBy("doc_id")
      .collect().map(_.toString).toSeq == expected)
    // the compression actually happened (file names carry the codec)
    val files = new java.io.File(zDir).listFiles.map(_.getName)
    assert(files.exists(_.contains("zstd")), files.mkString(", "))
  }

  test("streaming funnel matches batch counts; stages emit once, in order, across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // equivalence on the fixture feed (in-order, one micro-batch)
    val dir = Files.createTempDirectory("graft_funnelstream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/events.parquet"),
      java.nio.file.Path.of(dir, "events.parquet"))
    val src = EventStream.readEventsStream(spark, dir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Event]
    val q = EventStream.funnel(src)
      .writeStream.format("memory").queryName("funnel_stream_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val hits = spark.table("funnel_stream_test").collect()
    // each (user, stage) at most once
    assert(hits.map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage"))).distinct.length == hits.length)
    val perStage = hits.groupBy(_.getAs[Int]("stage")).view.mapValues(_.length.toLong).toMap
    graft.operators.EventOps.funnelStages(spark, sf).collect().foreach { r =>
      assert(perStage.getOrElse(r.getAs[Long]("stage").toInt, 0L) == r.getAs[Long]("n_users"),
        s"stage ${r.getAs[Long]("stage")}")
    }
    // cross-batch progression: click before view must NOT qualify; the
    // chain completes only once stages arrive in order
    val input = MemoryStream[EventStream.Event]
    def ev(id: Long, t: String, tpe: String) =
      EventStream.Event(id, java.sql.Timestamp.valueOf(t), 99L, tpe, 1.0)
    input.addData(Seq(ev(1, "2024-01-01 00:00:00", "click"), ev(2, "2024-01-01 00:01:00", "view")))
    val q2 = EventStream.funnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_stream_test2").outputMode("append").start()
    try {
      q2.processAllAvailable()
      val afterB1 = spark.table("funnel_stream_test2").collect()
      assert(afterB1.map(_.getAs[Int]("stage")).toSeq == Seq(1),
        "only the view qualifies in batch 1 (the click preceded any view)")
      input.addData(Seq(ev(3, "2024-01-01 00:02:00", "click"), ev(4, "2024-01-01 00:03:00", "purchase")))
      q2.processAllAvailable()
      val afterB2 = spark.table("funnel_stream_test2").orderBy("stage").collect()
      assert(afterB2.map(_.getAs[Int]("stage")).toSeq == Seq(1, 2, 3),
        "in-order arrivals complete the chain across micro-batches")
    } finally q2.stop()
  }

  test("streaming funnel state sizes to the stage list — 4 stages complete in order") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.Event]
    def ev(id: Long, t: String, tpe: String) =
      EventStream.Event(id, java.sql.Timestamp.valueOf(t), 5L, tpe, 1.0)
    input.addData(Seq(
      ev(1, "2024-01-01 00:00:00", "a"), ev(2, "2024-01-01 00:01:00", "b"),
      ev(3, "2024-01-01 00:02:00", "c"), ev(4, "2024-01-01 00:03:00", "d")))
    val q = EventStream.funnel(input.toDS(), stages = Seq("a", "b", "c", "d"))
      .writeStream.format("memory").queryName("funnel_stream_test4").outputMode("append").start()
    try {
      q.processAllAvailable()
      // stage 4 reached — the hardcoded-3-tuple state would have thrown
      input.addData(Seq(ev(5, "2024-01-01 00:04:00", "d")))
      q.processAllAvailable() // restored 4-slot state round-trips, no re-emit
    } finally q.stop()
    val stages = spark.table("funnel_stream_test4").orderBy("stage").collect()
      .map(_.getAs[Int]("stage")).toSeq
    assert(stages == Seq(1, 2, 3, 4), s"expected the full 4-stage chain, got $stages")
  }

  test("streaming transitions match batch counts and bridge micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_transstream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/events.parquet"),
      java.nio.file.Path.of(dir, "events.parquet"))
    val src = EventStream.readEventsStream(spark, dir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Event]
    val q = EventStream.transitions(src)
      .writeStream.format("memory").queryName("trans_stream_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("trans_stream_test").collect()
      .groupBy(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")))
      .view.mapValues(_.length.toLong).toMap
    val batch = graft.operators.EventOps.sessionTransitions(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("n_steps")).toMap
    assert(streamed == batch)
    // a step bridges micro-batches within the gap; a gap-crossing one doesn't
    val input = MemoryStream[EventStream.Event]
    def ev(id: Long, t: String, tpe: String) =
      EventStream.Event(id, java.sql.Timestamp.valueOf(t), 7L, tpe, 1.0)
    input.addData(Seq(ev(1, "2024-01-01 00:00:00", "view")))
    val q2 = EventStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("trans_stream_test2").outputMode("append").start()
    try {
      q2.processAllAvailable()
      input.addData(Seq(ev(2, "2024-01-01 00:10:00", "click")))
      q2.processAllAvailable()
      input.addData(Seq(ev(3, "2024-01-01 05:00:00", "purchase")))
      q2.processAllAvailable()
    } finally q2.stop()
    val steps = spark.table("trans_stream_test2").collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"))).toSeq
    assert(steps == Seq(("view", "click")),
      s"expected exactly the in-gap bridge step, got $steps")
  }

  test("transitions state expires at the gap horizon (TTL) without changing emitted steps") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.Event]
    def ev(id: Long, user: Long, t: String, tpe: String) =
      EventStream.Event(id, java.sql.Timestamp.valueOf(t), user, tpe, 1.0)
    input.addData(Seq(ev(1, 7, "2024-01-01 00:00:00", "view")))
    val q = EventStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("trans_ttl_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      // user 8 at 06:00 pushes the watermark to 05:00 — far past user
      // 7's gap horizon (00:30) — so user 7's state must be EVICTED
      input.addData(Seq(ev(2, 8, "2024-01-01 06:00:00", "view")))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 1, s"expected user 7 evicted (1 state row), got $stateRows")
      // user 7 returns at 06:10: state is gone, so no step — exactly
      // what the gap rule would have decided with state present
      // (06:10 − 00:00 ≫ gap); user 8's within-gap step still emits
      input.addData(Seq(ev(3, 7, "2024-01-01 06:10:00", "click"),
        ev(4, 8, "2024-01-01 06:20:00", "click")))
      q.processAllAvailable()
    } finally q.stop()
    val steps = spark.table("trans_ttl_test").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("from_type"),
        r.getAs[String]("to_type"))).toSeq
    assert(steps == Seq((8L, "view", "click")),
      s"expected only user 8's within-gap step, got $steps")
  }

  test("funnel completion horizon: expired attempts restart; default stays cumulative") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, user: Long, t: String, tpe: String) =
      EventStream.Event(id, java.sql.Timestamp.valueOf(t), user, tpe, 1.0)
    def run(horizon: Option[Long], name: String): Seq[(Long, Int, String)] = {
      val input = MemoryStream[EventStream.Event]
      val q = EventStream.funnel(input.toDS(), completionHorizonMinutes = horizon)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        input.addData(Seq(ev(1, 1, "2024-01-01 00:00:00", "view"),
          ev(2, 1, "2024-01-01 00:10:00", "click")))
        q.processAllAvailable()
        // u9 at 06:00 pushes the watermark far past u1's 00:30 horizon
        input.addData(Seq(ev(3, 9, "2024-01-01 06:00:00", "view")))
        q.processAllAvailable()
        // u1 returns: with a horizon the old attempt expired, so this
        // is a FRESH attempt and stage 1 re-emits; cumulative mode
        // remembers the first attempt and stays silent
        input.addData(Seq(ev(4, 1, "2024-01-01 06:10:00", "view")))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Int]("stage"), r.getAs[String]("event_type"))).toSeq.sorted
    }
    val horizoned = run(Some(30L), "funnel_horizon_test")
    assert(horizoned == Seq((1L, 1, "view"), (1L, 1, "view"), (1L, 2, "click"),
      (9L, 1, "view")), s"got $horizoned")
    val cumulative = run(None, "funnel_cumulative_test")
    assert(cumulative == Seq((1L, 1, "view"), (1L, 2, "click"), (9L, 1, "view")),
      s"got $cumulative")
    // the conf knob routes to the same behavior as the explicit param
    spark.conf.set(graft.GraftConf.FunnelHorizonKey, "30")
    try {
      val viaConf = run(None, "funnel_conf_horizon_test")
      assert(viaConf == horizoned, s"conf knob diverged: $viaConf vs $horizoned")
    } finally spark.conf.unset(graft.GraftConf.FunnelHorizonKey)
  }

  test("funnel stores no state for users whose events never match a stage") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.Event]
    def ev(id: Long, user: Long, tpe: String) =
      EventStream.Event(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), user, tpe, 1.0)
    // users 1-3 emit only non-stage events; user 4 reaches stage 1
    input.addData(Seq(ev(1, 1, "scroll"), ev(2, 2, "hover"), ev(3, 3, "scroll"),
      ev(4, 4, "view")))
    val q = EventStream.funnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_nostate_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows == 1, s"expected only user 4 to hold state, got $stateRows")
    assert(spark.table("funnel_nostate_test").collect().map(_.getAs[Long]("user_id")).toSeq == Seq(4L))
  }

  test("streaming transitions equal the local gap-rule model on random in-order feeds") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val gapUs = graft.GraftConf.DefaultSessionGap.toLong * 60L * 1000000L
    val types = Array("view", "click", "purchase")
    for (trial <- 1 to 3) {
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      var id = 0L
      val evs = (1L to 3L).flatMap { user =>
        var t = base + rng.nextInt(60) * 60000L
        (1 to 5 + rng.nextInt(8)).map { _ =>
          t += (1 + rng.nextInt(50)) * 60000L
          id += 1
          EventStream.Event(id, new java.sql.Timestamp(t), user,
            types(rng.nextInt(types.length)), 1.0)
        }
      }.sortBy(e => (e.ts.getTime, e.event_id))
      val expected = evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        es.sortBy(e => (e.ts.getTime, e.event_id)).sliding(2).collect {
          case Seq(a, b) if (b.ts.getTime - a.ts.getTime) * 1000L <= gapUs =>
            (u, a.event_type, b.event_type)
        }
      }.sorted
      val input = MemoryStream[EventStream.Event]
      val q = EventStream.transitions(input.toDS())
        .writeStream.format("memory").queryName(s"trans_prop_$trial")
        .outputMode("append").start()
      try {
        // in-order thirds across micro-batches: steps must bridge them
        evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
          input.addData(chunk); q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table(s"trans_prop_$trial").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("from_type"),
          r.getAs[String]("to_type"))).toSeq.sorted
      assert(got == expected, s"trial $trial: got $got expected $expected")
    }
  }

  test("streaming OOV monitor matches the batch projection and the oov_rate aggregates") {
    import graft.streaming.DocStream
    import graft.operators.TextAnalysis
    val vocab = TextAnalysis.vocabTerms(spark, sf)
    assert(vocab.nonEmpty && vocab.length <= TextAnalysis.VocabSize)
    val dir = Files.createTempDirectory("graft_oovstream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/documents.parquet"),
      java.nio.file.Path.of(dir, "documents.parquet"))
    val q = DocStream.oovStream(DocStream.readDocsStream(spark, dir), vocab)
      .writeStream.format("memory").queryName("oov_stream_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("oov_stream_test").orderBy("doc_id").collect()
    // stateless: streamed == the same projection on the batch frame
    val batch = DocStream.oovStream(Tables.documents(spark, sf), vocab)
      .orderBy("doc_id").collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch))
    // per-source sums reproduce the oracle-verified batch aggregates
    val agg = streamed.groupBy(_.getAs[String]("source")).map { case (s, rs) =>
      s -> ((rs.length.toLong, rs.map(_.getAs[Long]("n_tok")).sum,
        rs.map(_.getAs[Long]("n_oov")).sum))
    }
    TextAnalysis.oovStats(spark, sf).collect().foreach { r =>
      val (nDocs, nTok, nOov) = agg(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == nDocs && r.getAs[Long]("n_tokens") == nTok &&
        r.getAs[Long]("n_oov") == nOov)
    }
  }

  test("streaming quality-histogram monitor: periodic tail equals the batch grid quantiles") {
    import graft.streaming.DocStream
    import graft.operators.TextAnalysis
    val dir = Files.createTempDirectory("graft_qhiststream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/documents.parquet"),
      java.nio.file.Path.of(dir, "documents.parquet"))
    val q = DocStream.qualityHistStream(DocStream.readDocsStream(spark, dir))
      .writeStream.format("memory").queryName("qhist_stream_test").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    // the landed state is histogram-sized, never corpus-sized
    val hist = spark.table("qhist_stream_test")
    assert(hist.count() > 0 &&
      hist.count() == hist.select("source", "qbin").distinct().count())
    // periodic tail over the stream-landed histogram == the
    // oracle-verified batch query, bit for bit
    val streamed = TextAnalysis.quantilesFromQualityHist(hist).collect()
    val batch = TextAnalysis.qualityQuantilesGrid(spark, sf).collect()
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("streaming quarantine emits one (doc, rule) row per violation, none for clean docs") {
    import graft.streaming.DocStream
    import graft.operators.DataQuality
    val dir = Files.createTempDirectory("graft_dqstream").toString
    Files.copy(java.nio.file.Path.of(s"$sf/documents.parquet"),
      java.nio.file.Path.of(dir, "documents.parquet"))
    val q = DocStream.violationsStream(DocStream.readDocsStream(spark, dir))
      .writeStream.format("memory").queryName("dq_stream_test").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dq_stream_test").orderBy("doc_id", "rule").collect()
    // stateless: identical to the batch application
    val batch = DocStream.violationsStream(Tables.documents(spark, sf))
      .orderBy("doc_id", "rule").collect()
    assert(streamed.sameElements(batch))
    // per-rule counts reconcile with the oracle-verified dq_docs report
    val counts = streamed.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val report = DataQuality.dqDocs(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_violations")).toMap
    assert(report("documents.lang_unlisted") > 0) // the rule actually fires
    report.foreach { case (rule, n) => assert(counts.getOrElse(rule, 0L) == n) }
  }
}
