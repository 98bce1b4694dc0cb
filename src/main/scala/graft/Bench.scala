package graft
import org.apache.spark.sql.SparkSession
import java.util.Locale

object Bench {
  /** Compact FINAL stdout line — the only line the driver parses.
    *
    * The driver keeps the last ~2,000 characters of stdout and parses the
    * final line as JSON. Round 8 embedded the per-repetition `runs` array
    * here (~5 KB with 2 repeats × 38 queries); the line's head — including
    * `"metric":"total"` — fell outside the tail capture and the driver
    * recorded `parsed: null`. The repetition detail therefore prints on its
    * own EARLIER line ([[runsDetailJson]]) and this headline carries only
    * the compact fields; BenchArtifactSpec pins it under 1,500 chars against
    * the real headline query set so a future field can't silently re-break
    * the capture. Times are formatted to 0.1 ms (locale-fixed) — bench noise
    * floor is far above that — which keeps the line ~40% shorter than raw
    * Double.toString.
    */
  def headlineJson(total: Double, best: Seq[(String, Double)], sfDir: String,
                   repeats: Int, calibrationMs: Double, loadavg: String,
                   batch212MsPerQuery: Double,
                   batch212ColdMsPerQuery: Double): String = {
    def num(v: Double): String = String.format(Locale.ROOT, "%.4f", Double.box(v))
    val qs = best.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    val failedNames = best.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val failed = failedNames.mkString("[", ",", "]")
    // `value` is null (not a smaller number) when any query failed: the
    // total of a partial run must not read as a speedup to a consumer that
    // diffs `value` without also checking `failed`
    val valueJson = if (failedNames.isEmpty) num(total) else "null"
    // The serving trend ships under EXPLICIT names — batch212_STEADY_
    // (min of 2 on a warm handle: what every batch after the first costs
    // between mutations) and batch212_COLD_ (first batch on a fresh
    // handle, which pays the one-time context-snapshot build). The legacy
    // batch212_ms_per_query field stays, aliasing STEADY, because rounds
    // <= 16 recorded the conflated cold+steady value under that name: a
    // trend consumer diffing it across the r17 cut-over sees a
    // discontinuity that mixes the metric redefinition with the real
    // speedup (r17 ADVICE), so the semantics marker names the regime the
    // legacy field now carries and the cut-over round.
    s"""{"metric":"total","value":$valueJson,"unit":"sec","queries":$qs,""" +
      s""""failed":$failed,"sf":"$sfDir","repeats":$repeats,""" +
      s""""calibration_ms":${num(calibrationMs)},""" +
      s""""loadavg":"$loadavg","batch212_ms_per_query":${num(batch212MsPerQuery)},""" +
      s""""batch212_steady_ms_per_query":${num(batch212MsPerQuery)},""" +
      s""""batch212_semantics":"steady_since_r17",""" +
      s""""batch212_cold_ms_per_query":${num(batch212ColdMsPerQuery)}}"""
  }

  /** Time one query run; a THROWING query records -1.0, never its elapsed
    * time. Round 9's artifact recorded an analysis exception as the fastest
    * "query" in the suite (0.07 s) because the catch's -1L was the discarded
    * value of the try expression while the elapsed wall-clock was recorded
    * regardless — a failure improved the headline. Factored out so
    * BenchArtifactSpec can pin the contract with a deliberately-throwing
    * query. */
  def timeQuery(run: () => Unit): Double = {
    val t0 = System.nanoTime()
    try { run(); (System.nanoTime() - t0) / 1e9 }
    catch { case _: Throwable => -1.0 }
  }

  /** Headline total = sum of SUCCEEDED query minima only. A -1 failure
    * sentinel must never lower the total (round 9's crash deflated it);
    * failures are surfaced separately via the `failed` list in the
    * artifact, so a consumer comparing totals across rounds must also see
    * an empty failed list before trusting the comparison. */
  def headlineTotal(best: Seq[(String, Double)]): Double =
    best.collect { case (_, v) if v >= 0 => v }.sum

  /** Full per-repetition detail (calibration, loadavg, every timing) — its
    * own stdout line, printed BEFORE the headline so tail capture can only
    * ever truncate detail, never the parsed artifact. */
  def runsDetailJson(runs: Seq[(Double, String, Seq[(String, Double)])]): String = {
    def qJson(ts: Seq[(String, Double)]): String =
      ts.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    runs.map { case (cal, la, times) =>
      s"""{"calibration_ms":$cal,"loadavg":"$la","queries":${qJson(times)}}"""
    }.mkString("""{"detail":"bench_runs","runs":[""", ",", "]}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // This container has BURSTY external CPU contention (documented across
    // rounds 6-7): one run cannot be trusted even with calibration, so the
    // headline set runs N times (default 3 — round 9's 2-repeat artifact
    // still carried an 11 s cold-start outlier as a "minimum"; the builder's
    // clean records have always used 3) and the artifact reports per-query
    // MINIMA plus one calibration per repetition. Override with
    // SPARK_GRAFT_BENCH_REPEATS=1 for quick local iteration.
    val repeats = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // one session runs ~40 queries back to back (x repeats): keep the
      // status store's retained plan graphs/metrics bounded so listener-bus
      // and heap load don't creep up on the queries that happen to run last
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query isn't charged for
    // session + whole-stage-codegen initialization, and first-touch of the
    // main tables (file listing, footer reads, OS page cache) so those
    // one-time costs don't land on whichever query happens to sort first
    spark.range(1000).selectExpr("sum(id)").collect()
    // Self-validation probe: a fixed CPU-bound measurement, timed once per
    // repetition, plus the OS load average — a contention-corrupted
    // repetition is detectable from the artifact alone (~438 ms at the
    // quietest observed on this container; multiples of that, or a loadavg
    // far above the core count, mean that repetition's wall-clock numbers
    // are machine noise, not code).
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      // sum of int32 hashes over 2e8 rows peaks at ~4e17, safely inside long
      spark.range(200L * 1000 * 1000).selectExpr("sum(cast(hash(id) as bigint))").collect()
      (System.nanoTime() - t0) / 1e6
    }
    def loadavg(): String = try {
      java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ").take(3).mkString(",")
    } catch { case _: Throwable => "" }
    // warm the probe itself once (untimed) so every reported calibration
    // measures steady-state compute, not the probe's own codegen: quiet
    // baseline ~240 ms on this container under the warmed semantics
    // (rounds <= 7 reported the cold probe, quiet ~438 ms — not comparable)
    calibrate()
    Seq("region", "lineitem", "documents", "embeddings", "events").foreach(t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count())
    // Text-kernel warm-up (untimed): BENCH_r09 showed q_dedup_minhash at
    // 11.25 s in BOTH driver repetitions vs a 1.96 s quiet steady-state —
    // the first heavy text query was paying one-time shingle/regex/codegen
    // compilation for the whole text-pipeline expression family. One tiny
    // shingle+signature job compiles those kernels before anything is timed.
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      Seq((1L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text")
        .select(graft.functions.TextHash.minhashSigs(8)(
          graft.functions.TextHash.hashedShingles3(col("text"))))
        .count()
    } catch { case _: Throwable => () } // warm-up must never fail the bench
    // optional arg: comma-separated query-name filter (local iteration only;
    // the driver invokes with no args => full headline set)
    val only = args.headOption.map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.fold(SparkEntry.headline(name))(_.contains(name)) }
      .sortBy(_._1)
    val runs = (1 to repeats).map { r =>
      // every repetition measures the COLD pipeline: drop the session-level
      // plan caches (DfCache) and any stray persisted frames so repetition
      // N can't ride repetition N-1's materialized work — minima then
      // reflect quiet-machine code speed, not cache reuse. JIT/page-cache
      // warmth legitimately carries over (same binary, steady state).
      if (r > 1) {
        graft.queries.DfCache.clear(spark)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
      val cal = calibrate()
      val la = loadavg()
      val times = selected.map { case (name, fn) =>
        name -> timeQuery(() => fn(spark, sfDir).count())
      }
      (cal, la, times)
    }
    // per-query minimum across repetitions: the contention-robust estimate
    // (a query that failed in ANY repetition records -1.0 there, so the min
    // keeps the failure signal loud); calibration_ms mirrors that with the
    // min probe time. The total sums successes only — see headlineTotal.
    val best = selected.map { case (name, _) =>
      name -> runs.map(_._3.toMap.apply(name)).min
    }
    val total = headlineTotal(best)
    // Serving-latency trend (VERDICT r8 #8): run the 212-query LoTTE-shaped
    // batch harness once, OUTSIDE the timed headline set, and record its
    // amortized ms/query as a machine-tracked field. Skipped (-1) when the
    // local iteration filter is active or the harness fails.
    val (batch212, batch212Cold) = if (only.isEmpty) {
      try {
        SparkEntry.queries("q_engine_batch_search_212")(spark, sfDir).count()
        (graft.queries.EngineQueries.lastBatch212MsPerQuery,
          graft.queries.EngineQueries.lastBatch212ColdMsPerQuery)
      } catch { case _: Throwable => (-1.0, -1.0) }
    } else (-1.0, -1.0)
    println(runsDetailJson(runs))
    println(headlineJson(total, best, sfDir, repeats, runs.map(_._1).min,
      runs.head._2, batch212, batch212Cold))
    spark.stop()
  }
}
