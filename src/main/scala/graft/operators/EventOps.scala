package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-stream-shaped operators over the `events` table, plus the
  * window-analytic (top-N per group) operator a training pipeline uses
  * for per-source sampling.
  *
  * The tumbling-window aggregate is the batch twin of the Structured
  * Streaming pipeline in `graft.streaming` — same `window()` expression,
  * so the semantics verified here against DuckDB carry over to the
  * streaming path unchanged.
  */
object EventOps {

  /** Tumbling 1-hour windows per event type: count + exact value sum
    * (event values carry 2 decimals — the same integer-cents scheme as
    * the money queries). Spark's window() is epoch-aligned, so the
    * window start equals date_trunc('hour', ts). */
  def hourlyEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        RefQueries.sumMoneyExact(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start").asc, col("event_type").asc)
  }

  val hourlyEventCountsSql: String =
    s"""SELECT date_trunc('hour', ts) AS window_start,
       |       event_type,
       |       COUNT(*) AS n_events,
       |       ${RefQueries.sumMoneyExactSql("value")} AS sum_value
       |FROM events
       |WHERE ts IS NOT NULL AND event_type IS NOT NULL
       |GROUP BY window_start, event_type
       |ORDER BY window_start ASC, event_type ASC""".stripMargin

  /** Cutoff for [[hourlyCountsIncremental]] — deliberately NOT
    * hour-aligned, so one bucket spans both sides and the merge must
    * really add partials. */
  val HourlyIncrCutoff = "2024-01-16 12:30:00"

  /** Incremental maintenance of the hourly rollup — the
    * materialized-view refresh pattern: the pre-cutoff corpus plays
    * "yesterday's stored rollup", the post-cutoff slice is "today's
    * landing", and the result is the additive merge of the two partial
    * aggregates. The merge happens on EXACT integer cents and counts
    * (a stored `sum_value` double would make the merged sum depend on
    * which side divided first); the single scale-back division runs
    * after the merge, so the output is bit-identical to the full
    * recompute — which is exactly what the oracle states. At 100 TB
    * this is the difference between re-aggregating the corpus nightly
    * and aggregating one day's landing: delta-sized work, same answer. */
  def hourlyCountsIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit(HourlyIncrCutoff).cast("timestamp")
    def partial(pred: org.apache.spark.sql.Column): DataFrame =
      Tables.events(spark, sfDir)
        .where(col("ts").isNotNull && col("event_type").isNotNull && pred)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(RefQueries.cents(col("value"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("sc"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sc"))
    partial(col("ts") < cutoff)
      .unionByName(partial(col("ts") >= cutoff))
      .groupBy(col("window_start"), col("event_type"))
      .agg(sum(col("n")).as("n_events"), sum(col("sc")).as("sc"))
      .select(col("window_start"), col("event_type"), col("n_events"),
        (col("sc").cast("double") / 100.0).as("sum_value"))
      .orderBy(col("window_start").asc, col("event_type").asc)
  }

  /** Oracle = the FULL recompute ([[hourlyEventCountsSql]]): the
    * incremental merge must be indistinguishable from it. */
  val hourlyCountsIncrementalSql: String = hourlyEventCountsSql

  /** Trailing-window anomaly ratio — the monitor a pipeline points at
    * its event feed: each (hour, event_type) count against the mean of
    * the previous 24 OBSERVED hours of that type (bounded frame `ROWS
    * BETWEEN 24 PRECEDING AND 1 PRECEDING` — the window-frame surface
    * the unbounded cumulative queries don't exercise). All-integer
    * until one final IEEE division (n·window_rows / window_sum), so the
    * ratio is bit-identical across engines; the first hour of a type
    * has an empty frame → null ratio, NULLS FIRST pinned. Scale: the
    * hourly pre-aggregation does the corpus-size work; the window runs
    * over one row per (hour, type) — calendar-bounded, like
    * cumulative_revenue. */
  def trailingEventRatio(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))
    trailingRatioFromHourly(hourly)
  }

  /** The trailing-ratio window tail over ANY (window_start, event_type,
    * n_events) frame — shared by the batch query and the streaming
    * architecture's periodic tail (a stream lands hourly counts
    * continuously, e.g. `EventStream.hourlyCounts`; this batch pass
    * over the accumulated table computes the monitor — the same
    * continuous-land / periodic-aggregate split as the signature and
    * decontamination pipelines). */
  def trailingRatioFromHourly(hourly: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frame = Window.partitionBy(col("event_type")).orderBy(col("window_start").asc)
      .rowsBetween(-24, -1)
    hourly
      .withColumn("trail_sum", sum(col("n_events")).over(frame))
      .withColumn("trail_n", count(col("n_events")).over(frame))
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("trail_sum"), col("trail_n"),
        when(col("trail_sum") > 0,
          (col("n_events") * col("trail_n")).cast("double") / col("trail_sum"))
          .as("ratio"))
      .orderBy(col("window_start").asc, col("event_type").asc)
  }

  val trailingEventRatioSql: String =
    s"""WITH h AS (SELECT date_trunc('hour', ts) AS window_start, event_type,
       |                  COUNT(*) AS n_events
       |           FROM events
       |           WHERE ts IS NOT NULL AND event_type IS NOT NULL
       |           GROUP BY window_start, event_type),
       |t AS (SELECT window_start, event_type, n_events,
       |             SUM(n_events) OVER w AS trail_sum,
       |             COUNT(n_events) OVER w AS trail_n
       |      FROM h
       |      WINDOW w AS (PARTITION BY event_type ORDER BY window_start ASC
       |                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
       |SELECT window_start, event_type, n_events, trail_sum, trail_n,
       |       CASE WHEN trail_sum > 0
       |            THEN CAST(n_events * trail_n AS DOUBLE) / trail_sum END AS ratio
       |FROM t
       |ORDER BY window_start ASC, event_type ASC""".stripMargin

  /** Top-3 parts per return flag by revenue — ROW_NUMBER over a
    * partitioned window with a deterministic tiebreak. The window
    * partition key (l_returnflag) is the shuffle key; no global sort. */
  def topPartsPerFlag(spark: SparkSession, sfDir: String): DataFrame =
    topPartsPerFlag(spark, sfDir, graft.GraftConf.groupTopK(spark))

  def topPartsPerFlag(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .where(col("l_partkey").isNotNull && col("l_returnflag").isNotNull)
      .groupBy(col("l_returnflag"), col("l_partkey"))
      .agg(RefQueries.revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("revenue").desc, col("l_partkey").asc)
    rev.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .orderBy(col("l_returnflag").asc, col("rn").asc)
  }

  /** Sliding 1-hour windows every 30 minutes: each event lands in
    * exactly two epoch-aligned windows. The oracle enumerates the same
    * two starts per event (trunc-to-30min and 30min earlier) with exact
    * microsecond arithmetic. */
  def slidingEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))
      .orderBy(col("window_start").asc, col("event_type").asc)
  }

  val slidingEventCountsSql: String =
    """SELECT window_start, event_type, COUNT(*) AS n_events
      |FROM (SELECT event_type,
      |             make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - s.off) AS window_start
      |      FROM events, (SELECT unnest([0, 1800000000]) AS off) s
      |      WHERE ts IS NOT NULL AND event_type IS NOT NULL)
      |GROUP BY window_start, event_type
      |ORDER BY window_start ASC, event_type ASC""".stripMargin

  /** JSON property extraction (the `props` column is a JSON string —
    * the semi-structured payload every event pipeline carries):
    * get_json_object pulls `$.k`, aggregated per event type. Exact
    * integer sums; CAST(... AS BIGINT) pins the type on both engines. */
  def propsExtract(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .where(col("props").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type").asc)
  }

  /** Purchase→click attribution via [[AsofJoin]]: each purchase event
    * joined to the same user's most recent click at or before it.
    * Clicks are pre-aggregated to one row per (user, ts) (max event_id)
    * so the as-of match is unambiguous on both engines; 143 of the
    * sf0.01 purchases have no prior click and keep null attribution
    * (LEFT semantics). Oracle twin is DuckDB's native ASOF LEFT JOIN. */
  def purchaseAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"), col("click_id"))
    AsofJoin.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_ts", "click_id"))
      .orderBy(col("event_id").asc)
  }

  /** Time-range join without a cartesian: for each error event, the
    * count of the same user's clicks within ±[[RangeJoinWindowSec]]
    * seconds — the two-sided instance of the shared [[chunkProbeJoin]]
    * core (errors probe chunk ± 1; the exact |Δt| predicate is the
    * residual). Same banding idea as the dedup/ANN joins, applied to a
    * numeric range. */
  val RangeJoinWindowSec = 300

  def nearbyClickCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val winUs = RangeJoinWindowSec.toLong * 1000000L
    val ev = Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
    val errs = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val clicks = chunked(ev.where(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("cus")), "cus", winUs)
    val matched = chunkProbeJoin(errs, "us", clicks, winUs, Seq(-1, 0, 1))
      .where(abs(col("us") - col("cus")) <= winUs)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_nearby"))
    errs.select(col("event_id"), col("user_id"))
      .join(matched, Seq("event_id"), "left_outer")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_nearby"), lit(0L)).as("n_nearby"))
      .orderBy(col("event_id").asc)
  }

  /** Attribution window width shared by the batch operator and the
    * stream-stream join twin (`EventStream.attributionStream`). */
  val AttributionWindowSec = 21600

  /** The shared chunk-bucketed interval-join core ([[nearbyClickCounts]]
    * and [[attributionWindow]] both ride it): probe rows explode to
    * time chunks {ck + o | o ∈ offsets}, build rows carry their single
    * chunk, and the join is an EQUI-join on (user_id, chunk) — O(rows)
    * shuffle, never a per-user nested loop. The exhaustiveness
    * invariant lives HERE, once: with chunk width = winUs, offsets
    * {-1, 0} cover every pair with build_us ∈ [probe_us − win,
    * probe_us], and {-1, 0, 1} cover |Δus| ≤ win. The caller applies
    * the exact bound as a residual filter on the returned frame. */
  private def chunkProbeJoin(probe: DataFrame, probeUs: String,
                             build: DataFrame, winUs: Long,
                             offsets: Seq[Int]): DataFrame = {
    val probes = probe.withColumn("__ck",
      explode(array(offsets.map(o => expr(s"$probeUs div $winUs") + o): _*)))
    probes.join(build, Seq("user_id", "__ck")).drop("__ck")
  }

  /** Build side of [[chunkProbeJoin]]: tag each row with its chunk. */
  private def chunked(df: DataFrame, usCol: String, winUs: Long): DataFrame =
    df.withColumn("__ck", expr(s"$usCol div $winUs"))

  /** Windowed click→view attribution: every (click, view) pair of the
    * same user with the view at most [[AttributionWindowSec]] before
    * (or at) the click — the batch statement of the watermarked
    * stream-stream interval join, on the shared [[chunkProbeJoin]]
    * core (clicks probe {ck−1, ck}; the one-sided bound is the
    * residual). */
  def attributionWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val winUs = AttributionWindowSec.toLong * 1000000L
    val ev = Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("cus"))
    val views = chunked(ev.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        unix_micros(col("ts")).as("vus")), "vus", winUs)
    chunkProbeJoin(clicks, "cus", views, winUs, Seq(-1, 0))
      .where(col("vus") >= col("cus") - winUs && col("vus") <= col("cus"))
      .select(col("click_id"), col("view_id"), col("user_id"),
        (col("cus") - col("vus")).as("gap_us"))
      .orderBy(col("click_id").asc, col("view_id").asc)
  }

  val attributionWindowSql: String = {
    val winUs = AttributionWindowSec.toLong * 1000000L
    s"""WITH clicks AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus
       |                FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |                  AND event_type = 'click'),
       |views AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS vus
       |          FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |            AND event_type = 'view')
       |SELECT c.click_id, v.view_id, c.user_id, c.cus - v.vus AS gap_us
       |FROM clicks c JOIN views v
       |  ON c.user_id = v.user_id
       | AND v.vus >= c.cus - $winUs AND v.vus <= c.cus
       |ORDER BY c.click_id ASC, v.view_id ASC""".stripMargin
  }

  val nearbyClickCountsSql: String = {
    val winUs = RangeJoinWindowSec.toLong * 1000000L
    s"""WITH errs AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
       |              WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type = 'error'),
       |clicks AS (SELECT user_id, epoch_us(ts) AS cus FROM events
       |           WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type = 'click')
       |SELECT e.event_id, e.user_id, CAST(COUNT(c.cus) AS BIGINT) AS n_nearby
       |FROM errs e LEFT JOIN clicks c
       |  ON e.user_id = c.user_id AND abs(e.us - c.cus) <= $winUs
       |GROUP BY e.event_id, e.user_id
       |ORDER BY e.event_id ASC""".stripMargin
  }

  val purchaseAttributionSql: String =
    """WITH purchases AS (SELECT event_id, user_id, ts FROM events
      |                   WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type = 'purchase'),
      |clicks AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
      |           WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type = 'click'
      |           GROUP BY user_id, ts)
      |SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts, c.click_id
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.event_id ASC""".stripMargin

  val propsExtractSql: String =
    """SELECT event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events
      |WHERE props IS NOT NULL AND event_type IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type ASC""".stripMargin

  /** Gap-based sessionization (batch): a new session starts when the
    * per-user gap exceeds `gapMinutes`. Classic lag + running-sum window
    * pattern; all time arithmetic in exact microseconds (`unix_micros` /
    * `epoch_us`) so both engines agree. The per-user window partition is
    * the shuffle key — sessionizing 100 TB shuffles each user's events
    * once, no global sort. Streaming twin with explicit state:
    * `graft.streaming.EventSessions`. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame =
    sessionize(spark, sfDir, graft.GraftConf.sessionGapMinutes(spark))

  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val us = unix_micros(col("ts"))
    val newSession = when(lag(us, 1).over(byTs).isNull || us - lag(us, 1).over(byTs) > gapUs, 1L)
      .otherwise(0L)
    Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .withColumn("session_id", sum(newSession).over(byTs))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id").asc, col("session_id").asc)
  }

  def sessionizeSql(gapMinutes: Int = graft.GraftConf.DefaultSessionGap): String = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    s"""SELECT user_id, session_id,
       |       MIN(ts) AS session_start,
       |       MAX(ts) AS session_end,
       |       COUNT(*) AS n_events
       |FROM (SELECT user_id, ts,
       |             CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > $gapUs THEN 1 ELSE 0 END)
       |               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |      FROM (SELECT user_id, event_id, ts, epoch_us(ts) AS us,
       |                   LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
       |            FROM events
       |            WHERE ts IS NOT NULL AND user_id IS NOT NULL))
       |GROUP BY user_id, session_id
       |ORDER BY user_id ASC, session_id ASC""".stripMargin
  }

  /** Gap-based sessionization through Spark's NATIVE `session_window`
    * aggregation — the declarative twin of the hand-rolled
    * lag+running-sum [[sessionize]]. The merge boundary is IDENTICAL
    * (empirically pinned by spec on an exactly-gap pair): an event
    * exactly `gap` after its predecessor still MERGES — the native
    * window's end is merge-inclusive — so the oracle replays the same
    * strict `delta > gap` split as [[sessionizeSql]]; only the
    * reported session_end differs (`last_ts + gap`, the window bound,
    * instead of `last_ts`). Plan-wise the native form is ONE exchange
    * on user_id feeding a session-merging aggregate — no window pass,
    * no second shuffle; the same physical shape Structured Streaming
    * uses for watermarked session state at scale. */
  def sessionWindowNative(spark: SparkSession, sfDir: String): DataFrame =
    sessionWindowNative(spark, sfDir, graft.GraftConf.sessionGapMinutes(spark))

  def sessionWindowNative(spark: SparkSession, sfDir: String,
                          gapMinutes: Int): DataFrame =
    sessionWindowAgg(Tables.events(spark, sfDir), gapMinutes)

  /** The aggregation itself, frame-parametric so the spec can drive it
    * over a frame with a KNOWN exactly-gap event pair (the fixture may
    * or may not contain one). */
  private[graft] def sessionWindowAgg(events: DataFrame,
                                      gapMinutes: Int): DataFrame =
    events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id").asc, col("session_start").asc)

  def sessionWindowNativeSql(gapMinutes: Int = graft.GraftConf.DefaultSessionGap): String = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    s"""SELECT user_id,
       |       MIN(ts) AS session_start,
       |       MAX(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
       |       COUNT(*) AS n_events
       |FROM (SELECT user_id, ts,
       |             CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > $gapUs THEN 1 ELSE 0 END)
       |               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |      FROM (SELECT user_id, event_id, ts, epoch_us(ts) AS us,
       |                   LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
       |            FROM events
       |            WHERE ts IS NOT NULL AND user_id IS NOT NULL))
       |GROUP BY user_id, session_id
       |ORDER BY user_id ASC, session_start ASC""".stripMargin
  }

  /** The ordered funnel stages for [[funnelStages]]. */
  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** Funnel analysis — how many users progressed view → click →
    * purchase IN ORDER (each stage strictly after the previous one's
    * earliest qualifying time): the classic product-analytics query,
    * here as ONE window pass. Per user-ordered row, a running min of
    * qualifying stage-1 times gates stage 2, whose running min gates
    * stage 3 — so the whole funnel is three running-min columns over a
    * single (user) partition, one exchange total, never a self-join
    * per stage. The oracle is the INDEPENDENT join formulation
    * (min-ts CTE per stage, each joined strictly after the previous),
    * so the window encoding is cross-verified, not replayed.
    *
    * Output: one row per stage with the users reaching it. */
  def funnelStages(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col("ts"))
    val t1 = min(when(col("event_type") === FunnelStages(0), us)).over(w)
    val q2 = when(col("event_type") === FunnelStages(1) && us > col("t1r"), us)
    val q3 = when(col("event_type") === FunnelStages(2) && us > col("t2r"), us)
    // ONE aggregation over the window output (a per-stage filter+count
    // union would re-instantiate the corpus window subtree three times),
    // then the counts pivot to the 3-row stage shape via explode
    val counts = Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .withColumn("t1r", t1)
      .withColumn("t2r", min(q2).over(w))
      .withColumn("t3r", min(q3).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1r").isNotNull).as("s1"),
        max(col("t2r").isNotNull).as("s2"),
        max(col("t3r").isNotNull).as("s3"))
      .agg(sum(when(col("s1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("n3"))
    counts.select(explode(array(FunnelStages.zipWithIndex.map { case (name, i) =>
        struct(lit(i + 1L).as("stage"), lit(name).as("event_type"),
          col(s"n${i + 1}").as("n_users"))
      }: _*)).as("r"))
      .select(col("r.stage"), col("r.event_type"), col("r.n_users"))
      .orderBy(col("stage").asc)
  }

  val funnelStagesSql: String = {
    val Seq(s1, s2, s3) = FunnelStages
    s"""WITH u1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
       |            WHERE event_type = '$s1' AND ts IS NOT NULL AND user_id IS NOT NULL
       |            GROUP BY user_id),
       |u2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       |       JOIN u1 ON e.user_id = u1.user_id AND e.ts > u1.t1
       |       WHERE e.event_type = '$s2' GROUP BY e.user_id),
       |u3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       |       JOIN u2 ON e.user_id = u2.user_id AND e.ts > u2.t2
       |       WHERE e.event_type = '$s3' GROUP BY e.user_id)
       |SELECT CAST(1 AS BIGINT) AS stage, '$s1' AS event_type, COUNT(*) AS n_users FROM u1
       |UNION ALL SELECT 2, '$s2', COUNT(*) FROM u2
       |UNION ALL SELECT 3, '$s3', COUNT(*) FROM u3
       |ORDER BY stage ASC""".stripMargin
  }

  /** Within-session event-type transition matrix — the next-event
    * model a product team (or a user-behavior simulator) reads:
    * count of consecutive (from_type → to_type) steps inside one
    * session, sessions cut by the same gap rule as [[sessionize]].
    * One window pass over the same (user, ts) partition order the
    * sessionizer uses (one exchange); the transition pairing is a
    * per-row lag, so no self-join and nothing quadratic. The oracle
    * re-derives sessions and lags in SQL with the same exact-µs gap
    * arithmetic the sessionize oracle pins. */
  def sessionTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val gapUs = graft.GraftConf.sessionGapMinutes(spark).toLong * 60L * 1000000L
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val us = unix_micros(col("ts"))
    val newSession = when(lag(us, 1).over(byTs).isNull || us - lag(us, 1).over(byTs) > gapUs, 1L)
      .otherwise(0L)
    Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .withColumn("session_id", sum(newSession).over(byTs))
      .withColumn("from_type", lag(col("event_type"), 1).over(byTs))
      .withColumn("prev_session", lag(col("session_id"), 1).over(byTs))
      .where(col("from_type").isNotNull && col("prev_session") === col("session_id"))
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_steps"))
      .orderBy(col("from_type").asc, col("to_type").asc)
  }

  def sessionTransitionsSql(gapMinutes: Int = graft.GraftConf.DefaultSessionGap): String = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    s"""WITH ordered AS (SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS us,
       |                        LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us,
       |                        LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS from_type
       |                 FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
       |stepped AS (SELECT *,
       |                   CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > $gapUs THEN 1 ELSE 0 END)
       |                     OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |            FROM ordered)
       |SELECT from_type, event_type AS to_type, COUNT(*) AS n_steps
       |FROM stepped
       |WHERE from_type IS NOT NULL
       |  AND (prev_us IS NOT NULL AND us - prev_us <= $gapUs)
       |GROUP BY from_type, to_type
       |ORDER BY from_type ASC, to_type ASC""".stripMargin
  }

  /** Daily cohort retention — the other classic behavioral query: users
    * grouped by the DAY of their first event (their cohort), and for
    * each cohort the distinct users still active N days later. Two
    * narrow shuffles: a per-user min (8-byte keys, partial-agg'd) to
    * find cohort days, one join back on user_id, then a (cohort, age)
    * count-distinct whose key space is cohorts × horizon — bounded by
    * the calendar, not the corpus. Ages are exact integer day
    * differences of date-truncated timestamps, so both engines agree
    * without any timezone arithmetic (the session is pinned UTC). */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = events.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    events.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("age_days"))
      .groupBy(col("cohort_day"), col("age_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day").asc, col("age_days").asc)
  }

  val cohortRetentionSql: String =
    s"""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
       |           WHERE ts IS NOT NULL AND user_id IS NOT NULL),
       |c AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
       |SELECT c.cohort_day, CAST(e.day - c.cohort_day AS BIGINT) AS age_days,
       |       COUNT(DISTINCT e.user_id) AS n_users
       |FROM e JOIN c ON e.user_id = c.user_id
       |GROUP BY c.cohort_day, age_days
       |ORDER BY c.cohort_day ASC, age_days ASC""".stripMargin

  def topPartsPerFlagSql(k: Int = graft.GraftConf.DefaultGroupTopK): String =
    s"""SELECT l_returnflag, l_partkey, revenue, rn
       |FROM (SELECT l_returnflag, l_partkey, revenue,
       |             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY revenue DESC, l_partkey ASC) AS rn
       |      FROM (SELECT l_returnflag, l_partkey,
       |                   ${RefQueries.revenueExactSql("l_extendedprice", "l_discount")} AS revenue
       |            FROM lineitem
       |            WHERE l_partkey IS NOT NULL AND l_returnflag IS NOT NULL
       |            GROUP BY l_returnflag, l_partkey))
       |WHERE rn <= $k
       |ORDER BY l_returnflag ASC, rn ASC""".stripMargin
}
