package graft.streaming

import graft.index.IndexIVF
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming subsystem — a deliberate superset: the reference has no
  * streaming at all (SURVEY §2.11); its nearest analogue is incremental
  * `add`/`merge` (lintdb/index.cpp:481-535). Here ingestion is Structured
  * Streaming driving the same batch `add` pipeline through foreachBatch, so
  * every micro-batch gets the full explode -> assign -> encode -> append
  * path and the index stays queryable throughout.
  */
/** Per-user running state carried by [[StreamingIngest.userStats]]. */
case class UserStats(userId: Long, firstMs: Long, lastMs: Long, n: Long, sumValue: Double)

/** One admitted document from [[StreamingIngest.sourceCappedStream]]. */
case class AdmittedDoc(doc_id: Long, source: String, window_start_ms: Long, ts_ms: Long)

object StreamingIngest {

  /** Attach a streaming DataFrame of documents (same shape as
    * [[IndexIVF.add]] input) to an index. Caller stops the returned query. */
  def start(idx: IndexIVF, tenant: Long, docs: DataFrame,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) idx.add(tenant, batch)
      }
      .start()

  /** Streaming exact deduplication: state-backed dedup on a key, bounded by
    * a watermark so per-key state is actually evicted — the streaming twin of
    * the batch q_dedup_exact operator (for unbounded corpora the key should
    * be a content fingerprint, not the full text).
    *
    * Uses `dropDuplicatesWithinWatermark`, not `dropDuplicates`: plain
    * dropDuplicates only evicts state when the event-time column is itself a
    * dedup key, so with keys like `event_id` and the watermark on a separate
    * ts column it would keep every key's state forever — unbounded state
    * growth on a real unbounded stream. */
  def dedupedStream(stream: DataFrame, keyCols: Seq[String],
      tsCol: String, watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)

  /** Streaming NEAR-duplicate dedup: one 64-bit SimHash signature per doc
    * (the same kernel as batch q_dedup_simhash), deduped on the signature
    * with watermark-evicted state. Identical signatures collapse — exact
    * dups always, near-dups whenever their differences fall below the
    * per-bit majority vote — making this the streaming ingest filter of a
    * training-data pipeline: state is one long per signature within the
    * watermark, never a shingle set. */
  def nearDupDedupedStream(stream: DataFrame, textCol: String,
      tsCol: String, watermark: String): DataFrame =
    stream
      .withColumn("simhash", graft.functions.SimHash64Text(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("simhash"))

  /** Streaming decontamination guard: drop any incoming document that
    * shares a [[graft.queries.TextPipeline.DeconNgram]]-token shingle with
    * the benchmark shingle set — the eval-leak filter of a training-data
    * ingest pipeline, run BEFORE a contaminated doc ever reaches the
    * corpus (the batch twin, q_decontaminate, audits a corpus after the
    * fact). Stateless: the shingle array is built per row by the SAME
    * kernel as the batch operator and probed against a broadcast set, so
    * this adds zero streaming state and no shuffle at any rate.
    *
    * The benchmark set is collected to the driver and broadcast — it is
    * metadata-sized by nature (the eval suites, ~1e6 shingles at
    * production scale), and the guard refuses anything bigger than
    * [[DeconBenchMaxShingles]] loudly rather than silently building an
    * executor-crushing broadcast. The probe is a short-circuiting `exists`
    * over the row's own (deduped) shingles.
    *
    * `benchShingles` must expose the shingle strings in a column named
    * `sh` (the shape `TextPipeline.deconShingles` + `explode` produces).
    *
    * `maxContamMils` grades the verdict like the batch audit's
    * `contam_mils` (both in units of 1/[[graft.queries.TextPipeline
    * .MixScale]], the shared fixed-point scale — the same constant in
    * both comparisons means the guard and the audit can never disagree
    * about what "700 mils" is): a doc is dropped when hit shingles
    * exceed that per-mil fraction of its own shingles. The default 0
    * drops on ANY shared shingle (the strict end of published setups);
    * 700 ≈ the PaLM-style high-overlap bar. Short docs (no full window)
    * always pass.
    *
    * Broadcast lifecycle: each call ships one broadcast of the benchmark
    * set and the returned plan holds it for as long as it runs — the
    * CALLER owns that lifetime. A long-lived session that constructs
    * guards repeatedly should stop the old query and release the old
    * guard's broadcast by letting the plan be GC'd (Spark's
    * ContextCleaner reclaims unreferenced broadcasts); for deterministic
    * reclamation construct the guard once per benchmark-set version, not
    * per micro-batch or per restart. */
  def decontaminatedStream(stream: DataFrame, textCol: String,
      benchShingles: DataFrame, maxContamMils: Int = 0): DataFrame = {
    import graft.queries.TextPipeline
    require(maxContamMils >= 0 && maxContamMils < TextPipeline.MixScale,
      s"maxContamMils must be in [0, ${TextPipeline.MixScale}), got $maxContamMils")
    val limited = benchShingles.select(col("sh").cast("string"))
      .distinct().limit(DeconBenchMaxShingles + 1)
      .collect().map(_.getString(0)).toSet
    require(limited.size <= DeconBenchMaxShingles,
      s"benchmark shingle set exceeds $DeconBenchMaxShingles entries: a set " +
        "this large should not ride a broadcast — pre-filter the benchmark " +
        "suites or raise the limit deliberately")
    val bc = stream.sparkSession.sparkContext.broadcast(limited)
    val scale = TextPipeline.MixScale
    val contaminated = udf { (shingles: Seq[String]) =>
      val set = bc.value
      if (shingles.isEmpty) false
      else if (maxContamMils == 0) shingles.exists(set.contains)
      else {
        var hits = 0
        shingles.foreach(s => if (set.contains(s)) hits += 1)
        hits.toLong * scale > maxContamMils.toLong * shingles.length
      }
    }
    stream.filter(!contaminated(TextPipeline.deconShingles(col(textCol))))
  }

  /** Hard cap on the broadcast benchmark shingle set (entries). ~10M short
    * strings is on the order of a few hundred MB broadcast — already
    * generous; past that the right design is a stream-static join, not a
    * bigger broadcast. */
  val DeconBenchMaxShingles: Int = 10 * 1000 * 1000

  /** Streaming FUZZY decontamination guard — the cross-corpus near-dup
    * screen ([[graft.queries.TextPipeline.crossCorpusNearDups]]) applied at
    * INGEST time: drop any incoming document whose 3-word-shingle Jaccard
    * with some benchmark document is >= `minJaccard` — the screen that
    * catches paraphrased / lightly-edited eval leakage the exact-8-gram
    * guard ([[decontaminatedStream]]) misses, BEFORE the doc ever reaches
    * the corpus.
    *
    * Verdicts are the batch matcher's, restructured for a stream: the
    * benchmark side is metadata-sized by construction (eval suites), so
    * its banded-MinHash index — (band, bucket) -> bench doc ids, with the
    * batch path's hot-bucket cap applied per band — and its per-doc sorted
    * shingle-hash sets ride ONE broadcast, and the whole screen becomes a
    * stateless per-row probe: the incoming doc's shingles, signature mins,
    * and band buckets are computed row-locally by the SAME kernels as the
    * batch path (TextHash.hashedShingles3 / minhashSigs + the xxhash64
    * band fold), candidates come from <= `bands` broadcast-map lookups,
    * and the exact-Jaccard verify is a sorted-merge intersection against
    * each candidate's bench set (identical double arithmetic to the batch
    * verify). Zero streaming state, no shuffle, no stream-side
    * aggregation at any rate.
    *
    * Parity contract with the batch matcher: verdicts are IDENTICAL
    * whenever no INCOMING band bucket exceeds `BucketCap`; when one does,
    * the stream flags a SUPERSET of the batch verdicts. The batch path
    * caps BOTH join sides — an incoming bucket past the cap has its band
    * rows dropped (losing those docs' candidates through that band) to
    * bound the candidate JOIN's fan-out — while the stream's per-row probe
    * does bounded work per row regardless of how many incoming docs share
    * a bucket, so it deliberately keeps them. A flood of near-identical
    * incoming docs that all quote the same benchmark text is thus flagged
    * here and (partially) admitted by a batch re-audit — the conservative
    * direction for decontamination, where a false admit costs more than a
    * false drop. Only the bench-side cap (applied at index build above) is
    * shared. Docs shorter than 3 tokens have no shingles and always pass
    * (the batch matcher never flags them either). Broadcast lifecycle: as
    * with [[decontaminatedStream]], construct once per benchmark-set
    * version — the caller owns the returned plan's broadcast. */
  def fuzzyDecontaminatedStream(stream: DataFrame, textCol: String,
      benchDocs: DataFrame, minJaccard: Double = 0.5): DataFrame =
    withFuzzyVerdict(stream, textCol, benchDocs, minJaccard)
      .filter(col("_fuzzy").isNull).drop("_fuzzy")

  /** The flagged complement of [[fuzzyDecontaminatedStream]] — one row per
    * DROPPED incoming doc with its best benchmark match `(dup_of,
    * jaccard)`, the same (max Jaccard, min ex_id tiebreak, floor-rounded)
    * verdict the batch matcher emits — for audit sinks and the
    * batch/stream equality spec. */
  def fuzzyDeconMatches(stream: DataFrame, textCol: String,
      benchDocs: DataFrame, minJaccard: Double = 0.5): DataFrame =
    withFuzzyVerdict(stream, textCol, benchDocs, minJaccard)
      .filter(col("_fuzzy").isNotNull)
      .select(col("doc_id").as("in_id"), col("_fuzzy._1").as("dup_of"),
        graft.queries.QueryDef.floorRound(col("_fuzzy._2"), 4).as("jaccard"))

  /** Bench-side build shared by the whole-doc and chunked fuzzy guards
    * (batch frames, driver-collected once): sorted shingle-hash set per
    * bench doc/chunk + the hot-bucket-capped band index. */
  private def fuzzyBenchIndex(benchDocs: DataFrame)
      : (Map[Long, Array[Long]], Map[(Int, Long), Array[Long]]) = {
    import graft.queries.TextPipeline
    val bands = TextPipeline.MinhashBands
    val rows = TextPipeline.MinhashRows
    val bucketCap = TextPipeline.BucketCap
    val n = bands * rows
    val arrsEx = TextPipeline.shingleArrays(benchDocs)
    // bounded: the bench corpus is metadata-sized by contract — the
    // require() below refuses more than DeconBenchMaxShingles total
    val exSets: Map[Long, Array[Long]] = arrsEx
      .select(col("doc_id"), col("shs")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray.sorted).toMap
    require(exSets.valuesIterator.map(_.length.toLong).sum <= DeconBenchMaxShingles,
      s"benchmark corpus exceeds $DeconBenchMaxShingles total shingles: a set " +
        "this large should not ride a broadcast — pre-filter the benchmark " +
        "suites or screen in batch with crossCorpusNearDups")
    val sigsEx = TextPipeline.minhashSigs(arrsEx, n)
    val bandIndex: Map[(Int, Long), Array[Long]] = sigsEx
      .select(col("doc_id"), posexplode(array((0 until bands).map(i =>
        xxhash64((0 until rows).map(r => col(s"h${rows * i + r}")): _*)): _*))
        .as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("ids"))
      // the batch matcher's bench-side hot-bucket cap, applied at build
      // (bounded: band rows of the DeconBenchMaxShingles-guarded bench
      // corpus above, hot buckets dropped by the bucketCap filter)
      .filter(size(col("ids")) <= bucketCap)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        r.getSeq[Long](2).toArray.sorted).toMap
    (exSets, bandIndex)
  }

  /** Best bench match for ONE probe unit (a whole doc or one chunk):
    * candidates from <= `bands` band-index lookups, exact Jaccard by
    * sorted-merge intersection, best under (raw jaccard desc, ex id asc) —
    * identical arithmetic and tiebreak to the batch
    * crossCorpusNearDupsCore verify + per-in_id cut. `mine` must be
    * sorted-distinct; returns (bestExId, rawJaccard) or null. */
  private def bestBenchMatch(mine: Array[Long], buckets: Array[Long],
      sets: Map[Long, Array[Long]], idx: Map[(Int, Long), Array[Long]],
      minJaccard: Double): (Long, Double) = {
    val cands = scala.collection.mutable.SortedSet[Long]()
    var b = 0
    while (b < buckets.length) {
      idx.get((b, buckets(b))).foreach(ids => ids.foreach(cands += _))
      b += 1
    }
    var bestJ = -1.0
    var bestId = Long.MaxValue
    cands.foreach { ex =>
      val other = sets(ex)
      var i = 0; var j = 0; var common = 0
      while (i < mine.length && j < other.length) {
        if (mine(i) == other(j)) { common += 1; i += 1; j += 1 }
        else if (mine(i) < other(j)) i += 1
        else j += 1
      }
      val jac = common.toDouble / (mine.length + other.length - common)
      // candidates walk ex_id ascending, so strict > implements the
      // batch path's min-ex_id tiebreak
      if (jac >= minJaccard && jac > bestJ) { bestJ = jac; bestId = ex }
    }
    if (bestJ < 0) null else (bestId, bestJ)
  }

  private def withFuzzyVerdict(stream: DataFrame, textCol: String,
      benchDocs: DataFrame, minJaccard: Double): DataFrame = {
    import graft.queries.TextPipeline
    val bands = TextPipeline.MinhashBands
    val rows = TextPipeline.MinhashRows
    val n = bands * rows
    val (exSets, bandIndex) = fuzzyBenchIndex(benchDocs)
    val sc = stream.sparkSession.sparkContext
    val bcSets = sc.broadcast(exSets)
    val bcBands = sc.broadcast(bandIndex)
    val probe = udf { (shs: Seq[Long], buckets: Seq[Long]) =>
      if (shs == null) None
      else {
        // shs is already distinct (hashedShingles3) — sort for the merges
        val mine = shs.toArray
        java.util.Arrays.sort(mine)
        Option(bestBenchMatch(mine, buckets.toArray, bcSets.value,
          bcBands.value, minJaccard))
      }
    }
    val hs = graft.functions.TextHash.minhashSigs(n)(col("_shs"))
    stream
      .withColumn("_shs", graft.functions.TextHash.hashedShingles3(col(textCol)))
      .withColumn("_hs", hs)
      .withColumn("_fuzzy", probe(col("_shs"), array((0 until bands).map(i =>
        xxhash64((0 until rows).map(r => col("_hs")(rows * i + r)): _*)): _*)))
      .drop("_shs", "_hs")
  }

  /** Streaming CHUNKED fuzzy decontamination guard — the batch chunked
    * screen (`q_decontaminate_chunked`: both corpora re-keyed into
    * 64-token/stride-48 windows, the cross-corpus near-dup core at chunk
    * granularity, verdicts rolled up per parent) applied at INGEST time.
    * This is the screen a production ingest most needs: it catches
    * benchmark text QUOTED INSIDE a larger page, which the whole-doc
    * guard ([[fuzzyDecontaminatedStream]]) is structurally blind to (a
    * lightly-edited eval question inside a long article has tiny
    * whole-doc Jaccard).
    *
    * Shape: the bench side is chunked with the SAME batch
    * `chunkedDocs` frames (synthetic chunk id = parent * ChunkIdScale +
    * idx, so chunk verdicts map back to bench parents), then indexed and
    * broadcast exactly like the whole-doc guard. The incoming side is
    * chunked ROW-LOCALLY inside the probe: the UDF re-derives the
    * q_doc_chunk token windows from the raw text (same `split` / slice /
    * single-space join as the batch expression), runs the bit-identical
    * shingle (HashedShingles3.kernel) / minhash (MinHashSigs.kernel) /
    * band-fold (XXH64 chain, seed 42) kernels per chunk, probes each
    * chunk against the bench chunk index, and rolls the chunk verdicts up
    * to ONE (bench parent, jaccard) verdict per incoming doc under the
    * batch rollup's exact ordering (max 4-decimal-rounded jaccard, min
    * parent on ties). Zero streaming state, no shuffle, no explode — a
    * doc's chunks never leave its row.
    *
    * Parity contract: identical to the batch chunked screen's verdicts
    * whenever no INCOMING chunk band bucket is hot, a SUPERSET when one
    * is — same cap asymmetry (and the same conservative direction) as
    * [[fuzzyDecontaminatedStream]], now at chunk granularity. Incoming
    * doc ids play no role in the verdict (parents come from the BENCH
    * side's synthetic ids), so unlike the batch screen the stream accepts
    * any incoming id. */
  def chunkedFuzzyDecontaminatedStream(stream: DataFrame, textCol: String,
      benchDocs: DataFrame, minJaccard: Double = 0.5): DataFrame =
    withChunkedFuzzyVerdict(stream, textCol, benchDocs, minJaccard)
      .filter(col("_cfuzzy").isNull).drop("_cfuzzy")

  /** The flagged complement of [[chunkedFuzzyDecontaminatedStream]] — one
    * row per dropped doc with its best bench PARENT match `(dup_of,
    * jaccard)`, the same rolled-up verdict the batch chunked screen emits
    * — for audit sinks and the batch/stream equality spec. */
  def chunkedFuzzyDeconMatches(stream: DataFrame, textCol: String,
      benchDocs: DataFrame, minJaccard: Double = 0.5): DataFrame =
    withChunkedFuzzyVerdict(stream, textCol, benchDocs, minJaccard)
      .filter(col("_cfuzzy").isNotNull)
      .select(col("doc_id").as("in_id"), col("_cfuzzy._1").as("dup_of"),
        col("_cfuzzy._2").as("jaccard"))

  private def withChunkedFuzzyVerdict(stream: DataFrame, textCol: String,
      benchDocs: DataFrame, minJaccard: Double): DataFrame = {
    import graft.queries.TextPipeline
    val bands = TextPipeline.MinhashBands
    val rows = TextPipeline.MinhashRows
    val n = bands * rows
    val chunkTokens = TextPipeline.ChunkTokens
    val chunkStride = TextPipeline.ChunkStride
    val scale = TextPipeline.ChunkIdScale
    val (exSets, bandIndex) =
      fuzzyBenchIndex(TextPipeline.chunkedDocs(benchDocs, scale))
    val sc = stream.sparkSession.sparkContext
    val bcSets = sc.broadcast(exSets)
    val bcBands = sc.broadcast(bandIndex)
    val probe = udf { (text: String) =>
      if (text == null) None
      else {
        val sets = bcSets.value
        val idx = bcBands.value
        // limit -1 keeps trailing empty tokens, matching Spark's
        // split(text, ' ') used by the batch chunker
        val tokens = text.split(" ", -1)
        val nCh = 1 +
          (math.max(0, tokens.length - chunkTokens) + chunkStride - 1) / chunkStride
        // rollup accumulator under the batch bestMatchPerParent order:
        // max ROUNDED jaccard, min bench parent on ties
        var bestR = -1.0
        var bestParent = Long.MaxValue
        var ci = 0
        while (ci < nCh) {
          val start = ci * chunkStride
          val ctext = tokens.slice(start, start + chunkTokens).mkString(" ")
          val shsArr = graft.functions.HashedShingles3.kernel(
            org.apache.spark.unsafe.types.UTF8String.fromString(ctext))
          if (shsArr != null) {
            val sigs = graft.functions.MinHashSigs.kernel(shsArr, n).toLongArray()
            // band fold = Spark's XxHash64(cols..., seed 42): chain each
            // row's min through the running hash
            val buckets = new Array[Long](bands)
            var b = 0
            while (b < bands) {
              var h = 42L
              var r = 0
              while (r < rows) {
                h = org.apache.spark.sql.catalyst.expressions.XXH64
                  .hashLong(sigs(rows * b + r), h)
                r += 1
              }
              buckets(b) = h
              b += 1
            }
            val mine = shsArr.toLongArray()
            java.util.Arrays.sort(mine)
            val m = bestBenchMatch(mine, buckets, sets, idx, minJaccard)
            if (m != null) {
              // the batch frame rounds each chunk verdict (floorRound, 4
              // decimals) BEFORE the parent rollup compares them
              val r4 = math.floor(m._2 * 10000.0 + 0.5) / 10000.0
              val parent = m._1 / scale
              if (r4 > bestR || (r4 == bestR && parent < bestParent)) {
                bestR = r4; bestParent = parent
              }
            }
          }
          ci += 1
        }
        if (bestR < 0) None else Some((bestParent, bestR))
      }
    }
    stream.withColumn("_cfuzzy", probe(col(textCol)))
  }

  /** Per-(source, event-time-window) admission cap — the streaming twin of
    * batch q_source_cap, applied at INGEST time: a crawler burst or one
    * domain flooding the feed is cut off at `cap` docs per source per
    * window instead of swamping everything downstream (dedup state, the
    * index add path, the curated corpus). Batch caps by quality rank after
    * the fact; an unbounded stream cannot rank-then-cut, so admission is
    * first-arrival within the window — the honest streaming semantics, and
    * the two compose (ingest cap bounds volume, batch cap re-ranks within
    * it).
    *
    * State is ONE long (admitted count) per active (source, window) group,
    * evicted by an event-time timeout at window end: once the watermark
    * passes a window's end no admissible row for it can still arrive (late
    * rows beyond the watermark are dropped before the stateful operator),
    * so state is O(sources x windows inside the watermark horizon) at any
    * stream rate — this is the op that makes the OTHER per-key state sizes
    * (dedup signatures within the watermark) hold under a flood. */
  def sourceCappedStream(stream: DataFrame, tsCol: String, sourceCol: String,
      idCol: String, cap: Int, windowMs: Long = 3600L * 1000,
      watermark: String = "2 hours"): Dataset[AdmittedDoc] = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    import stream.sparkSession.implicits._
    stream
      .withWatermark(tsCol, watermark)
      // the watermark-tagged timestamp column must reach the stateful
      // operator itself (the event-time-timeout checker reads its
      // metadata, and a cast/alias would strip the tag), so it rides along
      // untouched and millis derive in the lambda
      .select(col(idCol).cast("long"), col(sourceCol).cast("string"),
        col(tsCol))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey { case (_, src, ts) =>
        val tms = ts.getTime
        (src, tms - java.lang.Math.floorMod(tms, windowMs))
      }
      .flatMapGroupsWithState[Long, AdmittedDoc](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((src, wStart), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var n = state.getOption.getOrElse(0L)
            val out = Vector.newBuilder[AdmittedDoc]
            rows.foreach { case (id, _, ts) =>
              if (n < cap) { n += 1; out += AdmittedDoc(id, src, wStart, ts.getTime) }
            }
            state.update(n)
            // surviving rows have ts >= watermark, so wStart + windowMs is
            // strictly ahead of the watermark here; the timeout fires (and
            // frees the count) exactly when the window can no longer admit
            state.setTimeoutTimestamp(wStart + windowMs)
            out.result().iterator
          }
      }
  }

  /** Gap-based session windows over a `ts`-timestamped event stream: one
    * output row per (user, session), session end = last event + gap (Spark
    * `session_window` semantics). The SAME plan serves the batch operator
    * q_session_window (watermark is a no-op on batch data) and incremental
    * execution under Structured Streaming (merging session state per key,
    * emitting a session once the watermark passes its end) — StreamingSpec
    * runs both. A superset: the reference has no temporal operators at all
    * (SURVEY §2.11). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"))

  /** Arbitrary-stateful per-key tracking via mapGroupsWithState — the
    * "custom state" extension point of §2.11 for logic no built-in
    * aggregation expresses. Keeps one small state record per user (first/
    * last event millis, count, value sum) and emits the updated record per
    * key per micro-batch. State size is O(active keys); with a watermark on
    * the source, pair with a state timeout for eviction on unbounded key
    * spaces (not needed for the bounded user space here). */
  def userStats(events: DataFrame): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").as[Long],
        unix_millis(col("ts")).as[Long], col("value").as[Double])
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(
            UserStats(userId, Long.MaxValue, Long.MinValue, 0L, 0.0))
          val next = rows.foldLeft(prev) { case (s, (_, tms, v)) =>
            UserStats(userId, math.min(s.firstMs, tms), math.max(s.lastMs, tms),
              s.n + 1, s.sumValue + v)
          }
          state.update(next)
          next
      }
  }

  /** Event-time windowed aggregation with watermark over a stream with a
    * `ts` timestamp column — the streaming twin of q_events_window; used by
    * StreamingSpec to prove the same plan runs incrementally. */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("sum_value"))
}
