package graft

import java.nio.file.Files

import graft.sources.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SinksStreamingSpec extends SparkSpec {

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

  test("external-table DDL registers a catalog table over pipe text (S6 parity)") {
    val dir = Files.createTempDirectory("graft_ext").toString
    val cols = Tables.lineitemSchema.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
    Tables.writePipeDelimited(Tables.lineitem(spark, sf).select(cols.toSeq: _*).limit(100), dir)
    Tables.createExternalPipeTable(spark, "lineitem_ext", dir, Tables.lineitemSchema)
    assert(spark.sql("SELECT count(*) FROM lineitem_ext").collect()(0).getLong(0) == 100)
    assert(spark.sql("SELECT sum(l_quantity) FROM lineitem_ext").collect()(0).getDouble(0) > 0)
    spark.sql("DROP TABLE lineitem_ext")
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
}
