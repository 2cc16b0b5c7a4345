package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // benchmark under the same planning-time cartesian guard Verify runs
    graft.plans.NoCartesianGuard.install(spark)
    spark.conf.set(GraftConf.NoCartesianGuardKey, "true")
    // optional session confs for scale experiments, same contract as
    // BenchPair (Verify refuses oracle-pinned overrides; a bench run
    // measures wall-clock, not oracle equality, so knobs are fair
    // here — any override is recorded in the output JSON):
    //   SPARK_GRAFT_CONF="spark.graft.ivf.k=auto"
    // malformed segments (empty key, no '=') are dropped, not passed to
    // spark.conf.set where an empty key throws and aborts the bench
    val confOverrides = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).filter(_.contains("=")).flatMap { kv =>
        val Array(k, v) = kv.split("=", 2)
        if (k.trim.isEmpty) None
        else {
          spark.conf.set(k.trim, v.trim)
          Some(k.trim + "=" + v.trim)
        }
      }
    // Box-speed control (r15): inter-round bench totals have repeatedly
    // drifted with HOST state, not code — r14 adjudicated a +26% drift
    // by rebuilding r12's code (130.2 s on queries it recorded at
    // 103.4 s), and r15 measured the same box at 0.69 vs 1.51 s on an
    // identical single-core loop minutes apart. Every bench run now
    // self-records a deterministic single-core integer probe (xorshift,
    // JIT-warmed, 500M steps) before, between, and after the query
    // passes, so cross-round totals can be normalized by recorded box
    // speed instead of a code-rebuild control experiment per round.
    def cpuProbe(): Double = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      val t0 = System.nanoTime()
      while (i < 500000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      if (x == 0L) System.err.println("probe") // keep the loop live
      dt
    }
    cpuProbe() // discarded JIT warmup
    val probeBefore = cpuProbe()
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // a failed query is the -1 sentinel in the JSON; the CAUSE goes
          // to stderr (a silent -1 across the board cost r11 a bench run)
          System.err.println(s"BENCH query failed: ${e.getClass.getName}: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Two passes, report the min: the first pass absorbs JVM/codegen/scan
    // warmup that would otherwise be attributed to whichever query runs
    // first. A -1 (error) stays -1.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val pass1 = names.map(n => n -> timeOnce(SparkEntry.queries(n))).toMap
    // drop persisted intermediates so pass 2 measures true recompute,
    // not cache reads (clearCache covers persisted plans; reset drops
    // the memoized checkpoint frames, which clearCache cannot see)
    spark.catalog.clearCache()
    graft.operators.Materialize.reset(spark)
    val probeMid = cpuProbe()
    val results = names.map { n =>
      val t2 = timeOnce(SparkEntry.queries(n))
      val t1 = pass1(n)
      n -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }
    val probeAfter = cpuProbe()
    // JSON string escape (same contract as Verify's q()): conf override
    // VALUES are user-supplied and may contain quotes/backslashes that
    // would otherwise emit invalid JSON; query names are identifiers
    // but get the same treatment for uniformity.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => q(k) + ":" + v }
      .mkString("{", ",", "}")
    // a failed query is the -1.0 sentinel in the per-query map; it must
    // NOT be summed into the total (it would silently SHRINK it) — the
    // total covers successful queries and failures are listed by name
    val errs = results.collect { case (k, v) if v < 0 => q(k) }
      .mkString("[", ",", "]")
    // Exact/super-linear-baseline bucket (PLANS.md r12 bench policy,
    // widened r13): registrations that are super-linear at scale BY
    // DESIGN — the two brute-force kNN baselines (O(|Q|·n·dim)) and
    // the FIXED-k=8 IVF route (n/8 vectors per probed cell grows
    // linearly with the corpus; `knn_label_ivf_auto` is the √n-flat
    // scale shape and stays in the headline). These are the documented
    // baselines the serving paths are graded AGAINST — at sf>=10 they
    // dominate wall-clock while saying nothing about the serving
    // paths' scaling. They always RUN and are always reported;
    // SPARK_GRAFT_EXACT_BUCKET=exclude (set for sf>=10 re-cuts) moves
    // them out of the headline "value" into their own subtotal.
    // Default (driver per-round bench at sf0.1) keeps the headline
    // all-inclusive so round-over-round totals stay comparable.
    val exactBaseline = Set("knn_label", "sql_knn_label", "knn_label_ivf")
    val exclude = sys.env.get("SPARK_GRAFT_EXACT_BUCKET").contains("exclude")
    val exactTotal = results.collect {
      case (k, v) if exactBaseline(k) && v >= 0 => v }.sum
    val total = results.collect { case (_, v) if v >= 0 => v }.sum -
      (if (exclude) exactTotal else 0.0)
    val exactJson = {
      val m = results.collect { case (k, v) if exactBaseline(k) => q(k) + ":" + v }
        .mkString("{", ",", "}")
      val policy = if (exclude) "excluded-from-headline" else "included-in-headline"
      s"""{"queries":$m,"total":$exactTotal,"policy":${q(policy)}}"""
    }
    // Build-phase bucket (ADVICE r14): `pq_build` is a deliberate alias
    // of `pq_encode` registered so alphabetical sweeps bill the pqIndex
    // materialization to it and the serving queries measure warm. That
    // double-counts one result set in the registry, so aggregate
    // cross-round statistics (per-query means, family subtotals) should
    // read this bucket and exclude it. It stays in the headline total
    // by default for round-over-round comparability (same policy knob
    // shape as the exact-baseline bucket).
    val buildPhase = Set("pq_build")
    val buildTotal = results.collect {
      case (k, v) if buildPhase(k) && v >= 0 => v }.sum
    val buildJson = {
      val m = results.collect { case (k, v) if buildPhase(k) => q(k) + ":" + v }
        .mkString("{", ",", "}")
      s"""{"queries":$m,"total":$buildTotal,"policy":"included-in-headline; exclude from per-query aggregate stats"}"""
    }
    val conf = confOverrides.map(q).mkString("[", ",", "]")
    val probeJson =
      s"""{"before":$probeBefore,"mid":$probeMid,"after":$probeAfter,"unit":"sec per 500M xorshift steps, single core"}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","errors":$errs,"conf":$conf,"cpu_probe":$probeJson,"exact_baseline":$exactJson,"build_phase":$buildJson,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Also persist to the repo: the driver captures the stdout tail,
    // which truncates the per-query map once the registry is this big
    // (r7 lost 53 of 119 numbers) — the file is the complete record.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      val outPath = java.nio.file.Paths.get(out).toAbsolutePath
      java.nio.file.Files.write(outPath, (json + "\n").getBytes("UTF-8"))
      // round-stamped copy, so every round's FULL per-query record is
      // versioned even though the driver's stdout tail-capture truncates:
      // the driver's own BENCH_r<N>.json siblings identify the round in
      // progress (max existing N + 1)
      val dir = outPath.getParent
      val R = "BENCH_r(\\d+)\\.json".r
      val prev = dir.toFile.list() match {
        case null => Seq.empty[Int]
        case fs => fs.toSeq.collect { case R(n) => n.toInt }
      }
      if (prev.nonEmpty) {
        val stamped = dir.resolve(f"bench_out_r${prev.max + 1}%02d.json")
        java.nio.file.Files.write(stamped, (json + "\n").getBytes("UTF-8"))
      }
    }
    catch { case e: Throwable => System.err.println(s"bench_out write failed: $e") }
    spark.stop()
  }
}
