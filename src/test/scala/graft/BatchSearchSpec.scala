package graft

import graft.core._
import graft.index.IndexIVF
import graft.query._
import org.scalatest.funsuite.AnyFunSuite

/** Batch search must agree with N independent single-query searches. */
class BatchSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("searchBatch == per-query search results") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(3)
    val corpus = (0L until 30L).map { i =>
      i -> Seq.fill(4)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toMap
    val path = java.nio.file.Files.createTempDirectory("idx_batch").toString
    val idx = IndexIVF.create(spark, path, GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 6, numIterations = 4))))
    val docs = corpus.toSeq.sortBy(_._1).map { case (i, t) => Doc(i, t, "x", 0L) }
      .toDF().select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert"))
    idx.train(docs)
    idx.add(1, docs)

    val opts = SearchOptions(kTopCentroids = 3, nProbe = 6)
    val queryIds = Seq(2L, 11L, 23L)
    val queriesDf = queryIds.map(qid => (qid, corpus(qid))).toDF("query_id", "tokens")

    val batch = BatchSearcher.searchBatch(idx, 1, "colbert", queriesDf, k = 5, opts)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap

    queryIds.foreach { qid =>
      val single = idx.search(1, VectorQuery("colbert", corpus(qid).map(_.toArray).toArray),
          k = 5, opts)
        .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid).map(_._1) == single.map(_._1), s"doc ranking for query $qid")
      batch(qid).zip(single).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-6)
      }
    }

    // both rerank-input shapes (re-join context after the window cut vs
    // carrying residuals through it — see CarryResidualsKey) must return
    // identical rows
    spark.conf.set(BatchSearcher.CarryResidualsKey, "true")
    try {
      val carried = BatchSearcher.searchBatch(idx, 1, "colbert", queriesDf, k = 5, opts)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
      queryIds.foreach(qid => assert(carried(qid) == batch(qid),
        s"carry-residuals shape diverged for query $qid"))
    } finally spark.conf.unset(BatchSearcher.CarryResidualsKey)
    // (the old MaxMatrixBytes plan-constant guard is gone with the plan
    // constant itself: phase-1 now reads the centroid matrix through the
    // per-index broadcast, so nothing K-proportional ships with the plan)
  }

  test("byte-denominated gates: fat rows trip the broadcast-context gate " +
      "where a row budget would pass, and the pool guard refuses in bytes") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(9)
    // FAT rows: 6 docs x 96 tokens each — any sane ROW gate (the old
    // default was 16M rows) sails through, but the measured relation is
    // ~6 x (8 + 96*8 + 48) ≈ 4.9 KB
    val corpus = (0L until 6L).map { i =>
      i -> Seq.fill(96)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toMap
    val path = java.nio.file.Files.createTempDirectory("idx_bytegate").toString
    val idx = IndexIVF.create(spark, path, GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 4, numIterations = 2))))
    val docs = corpus.toSeq.sortBy(_._1).map { case (i, t) => Doc(i, t, "x", 0L) }
      .toDF().select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert"))
    idx.train(docs)
    idx.add(1, docs)

    val measured = BatchSearcher.contextRelationBytes(idx, 1, "colbert")
    assert(measured > 4000L && measured < 20000L,
      s"measured relation bytes $measured outside the fat-row envelope")

    val opts = SearchOptions(kTopCentroids = 2, nProbe = 4)
    val queriesDf = Seq(1L, 4L).map(qid => (qid, corpus(qid)))
      .toDF("query_id", "tokens")
    def run(): Map[Long, Seq[(Long, Double)]] =
      BatchSearcher.searchBatch(idx, 1, "colbert", queriesDf, k = 3, opts)
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    val unrestricted = run()

    // cap BELOW the measured bytes (but far above the row count): the gate
    // must fall back to the shuffle shape and still return identical rows
    spark.conf.set(BatchSearcher.BroadcastContextMaxBytesKey, "1024")
    try assert(run() == unrestricted,
      "shuffle-shape fallback under the byte gate diverged")
    finally spark.conf.unset(BatchSearcher.BroadcastContextMaxBytesKey)

    // pool guard: 2 queries x 1024 numSecondPass x 16 B = 32 KiB — a
    // 1 KiB budget must refuse BEFORE collecting, in bytes
    spark.conf.set(BatchSearcher.MaxPoolBytesKey, "1024")
    try {
      val e = intercept[IllegalArgumentException](run())
      assert(e.getMessage.contains("bytes"), e.getMessage)
    } finally spark.conf.unset(BatchSearcher.MaxPoolBytesKey)
  }

  test("over-gate distributed walk: identical rows to the scan shape, " +
      "no postings reference in the walk plan, mutation visible") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(77)
    def tokens() = Seq.fill(4)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val corpus = (0L until 45L).map(i => i -> tokens()).toMap
    val path = java.nio.file.Files.createTempDirectory("idx_distwalk").toString
    val idx = IndexIVF.create(spark, path, GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 6, numIterations = 4))))
    val docs = corpus.toSeq.sortBy(_._1).map { case (i, t) => Doc(i, t, "x", 0L) }
      .toDF().select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert"))
    idx.train(docs)
    idx.add(1, docs)

    val opts = SearchOptions(kTopCentroids = 3, nProbe = 6)
    val queriesDf = Seq(3L, 20L, 41L).map(qid => (qid, corpus(qid)))
      .toDF("query_id", "tokens")
    def run(): (Map[Long, Seq[(Long, Double)]], String) = {
      val df = BatchSearcher.searchBatch(idx, 1, "colbert", queriesDf, 5, opts)
      val rows = df.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
      (rows, df.queryExecution.executedPlan.toString)
    }

    val (underGate, _) = run() // broadcast-snapshot walk (reference rows)
    // force the over-gate regime: every shape below must reproduce the
    // under-gate rows bit-identically
    spark.conf.set(BatchSearcher.BroadcastContextMaxBytesKey, "1024")
    try {
      val (distWalked, _) = run() // DistributedWalkKey defaults true
      assert(distWalked == underGate,
        "over-gate distributed walk diverged from the broadcast-walk rows")
      val (steady, _) = run() // second batch rides the cached partitions
      assert(steady == underGate, "steady over-gate batch diverged")
      spark.conf.set(BatchSearcher.DistributedWalkKey, "false")
      try {
        val (scanShape, _) = run()
        assert(scanShape == underGate,
          "over-gate scan-shape hatch diverged from the distributed walk")
      } finally spark.conf.unset(BatchSearcher.DistributedWalkKey)

      // plan pin (multiget off keeps phase-1 in the returned lineage):
      // the walk must not reference the postings relation — its
      // centroid_bucket column is the marker — while the hatch must
      // (canary that the marker still detects the scan shape)
      spark.conf.set(BatchSearcher.RerankMultigetKey, "false")
      try {
        val (walkRows, walkPlan) = run()
        assert(walkRows == underGate, "multiget-off distributed walk diverged")
        assert(!walkPlan.contains("centroid_bucket"),
          s"the distributed walk must not scan the postings table:\n$walkPlan")
        spark.conf.set(BatchSearcher.DistributedWalkKey, "false")
        try {
          val (scanRows, scanPlan) = run()
          assert(scanRows == underGate, "multiget-off scan shape diverged")
          assert(scanPlan.contains("centroid_bucket"),
            "the hatch must restore the postings-scan shape (plan-pin canary)")
        } finally spark.conf.unset(BatchSearcher.DistributedWalkKey)
      } finally spark.conf.unset(BatchSearcher.RerankMultigetKey)

      // freshness rides the partitioned snapshot's own invalidation: a doc
      // added after the build must be visible to the next over-gate batch
      idx.add(1, Seq(Doc(300L, corpus(3L).map(_.map(_ + 0.001f)), "x", 0L)).toDF()
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("colbert")))
      val after = BatchSearcher.searchBatch(idx, 1, "colbert",
        Seq((3L, corpus(3L))).toDF("query_id", "tokens"), k = 10, opts)
        .collect().map(_.getLong(1)).toSet
      assert(after.contains(300L),
        s"doc added after the partitioned-snapshot build must be visible, got $after")
    } finally spark.conf.unset(BatchSearcher.BroadcastContextMaxBytesKey)
  }

  test("saturation detector: flat boundary escalates, real gap does not") {
    // synthesized saturated fixture: 64 candidates whose scores are
    // near-identical across the cut at base=8 (the tight-cluster signature)
    val flat = Array.tabulate(64)(i => 10.0 - i * 1e-7)
    assert(BatchSearcher.boundarySaturated(flat, base = 8, eps = 1e-3),
      "near-tied scores across the boundary must read as saturated")
    // a genuine ranking gap at the cut: top 8 ~10.0, rest ~1.0
    val gapped = Array.tabulate(64)(i => if (i < 8) 10.0 - i * 0.01 else 1.0 - i * 0.001)
    assert(!BatchSearcher.boundarySaturated(gapped, base = 8, eps = 1e-3),
      "a real score gap at the boundary must NOT escalate")
    // fewer candidates than the cut: nothing to escalate
    assert(!BatchSearcher.boundarySaturated(flat.take(5), base = 8, eps = 1e-3))
    // a flat continuum at the boundary BELOW a separated top must NOT
    // escalate: phase-1 already ranked those docs out of contention (the
    // pervasive near-tie shape of a dense corpus, not the miss mechanism)
    val lowPlateau = Array.tabulate(64)(i => if (i < 8) 10.0 - i else 1.0 - i * 1e-9)
    assert(!BatchSearcher.boundarySaturated(lowPlateau, base = 8, eps = 1e-3),
      "a boundary plateau below a well-separated top is not saturation")

    val rows =
      flat.zipWithIndex.map { case (s, i) => (1L, i.toLong, s) } ++
      gapped.zipWithIndex.map { case (s, i) => (2L, i.toLong, s) }
    val (kept, escalated) = BatchSearcher.adaptivePoolCut(rows, base = 8,
      esc = 32, eps = 1e-3)
    assert(escalated == 1, "only the saturated query escalates")
    val byQ = kept.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byQ(1L) == 32, s"saturated query keeps esc pairs, got ${byQ(1L)}")
    assert(byQ(2L) == 8, s"unsaturated query keeps base pairs, got ${byQ(2L)}")
  }

  test("width-derived tie eps: the default power law reproduces both " +
      "measured calibration points and a numeric conf overrides it") {
    // the two operating points that pinned the law (COVERAGE.md r15/r17):
    // width 4 -> 1e-3 (83/212 escalated at 10M), width 120 -> 1e-4
    // (147/212 escalated, success@5 = 1.0) — the derived DEFAULT must land
    // on the measured-good values at both widths, not just interpolate
    assert(math.abs(BatchSearcher.defaultTieEps(4.0) - 1e-3) < 1e-9)
    assert(math.abs(BatchSearcher.defaultTieEps(120.0) - 1e-4) < 2e-6)
    // monotone in width, clamped against degenerate estimates
    assert(BatchSearcher.defaultTieEps(32.0) < 1e-3)
    assert(BatchSearcher.defaultTieEps(32.0) > 1e-4)
    assert(BatchSearcher.defaultTieEps(0.0) <= 1e-2)
    assert(BatchSearcher.defaultTieEps(1e9) >= 1e-5)

    // width recovery inverts the byte-gate accounting exactly:
    // bytes = rows x (8 + 8 x width + 48)
    val rows = 1000L
    val width = 120L
    val bytes = rows * (8L + 8L * width + 48L)
    assert(math.abs(BatchSearcher.avgDocWidth(rows, bytes) - 120.0) < 1e-9)
    // no stats in hand (shuffle shape sentinel / empty corpus): falls back
    // to the width-4 calibration point
    assert(BatchSearcher.avgDocWidth(0L, 0L) == 4.0)
    assert(BatchSearcher.avgDocWidth(10L, Long.MaxValue) == 4.0)

    // explicit numeric conf short-circuits the derivation
    spark.conf.set(BatchSearcher.NspTieEpsKey, "7e-4")
    try assert(BatchSearcher.nspTieEps(spark, rows, bytes) == 7e-4)
    finally spark.conf.unset(BatchSearcher.NspTieEpsKey)
    assert(math.abs(BatchSearcher.nspTieEps(spark, rows, bytes) - 1e-4) < 2e-6)
  }

  test("adaptive cut sorts with the heap's own total order (NaN first, " +
      "±0.0 tied to doc_id) and refuses base < 1") {
    // NaN ranks ABOVE every double in the heap/window order; a
    // (-score, doc_id) tuple sort would negate NaN to last and keep docs
    // 2,3 instead — the off-path equivalence the r16 ADVICE flagged
    val nanRows = Array((1L, 1L, Double.NaN), (1L, 2L, 5.0), (1L, 3L, 0.0))
    val (nanKept, _) = BatchSearcher.adaptivePoolCut(nanRows, base = 2,
      esc = 3, eps = 1e-3)
    assert(nanKept.map(_._2).toSeq == Seq(1L, 2L),
      s"NaN must rank first like the phase-1 heap, got ${nanKept.toSeq}")
    // -0.0 == 0.0 ties in the heap order and breaks to doc_id asc; the
    // tuple sort's negation splits them (-0.0 < 0.0 in the total order).
    // esc == base: the tie saturates the boundary (by design), but the
    // escalated keep-count equals base, so what survives is purely the
    // comparator's rank-1 choice
    val zeroRows = Array((1L, 10L, 0.0), (1L, 5L, -0.0))
    val (zeroKept, _) = BatchSearcher.adaptivePoolCut(zeroRows, base = 1,
      esc = 1, eps = 1e-3)
    assert(zeroKept.map(_._2).toSeq == Seq(5L),
      s"±0.0 must tie and break to doc_id asc, got ${zeroKept.toSeq}")
    // base = 0 would index scores(-1) in the detector: named error instead
    val err = intercept[IllegalArgumentException] {
      BatchSearcher.adaptivePoolCut(zeroRows, base = 0, esc = 2, eps = 1e-3)
    }
    assert(err.getMessage.contains("numSecondPass"), err.getMessage)
  }

  test("adaptive cut recovers a doc a fixed cut drops on a saturated cluster") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(5)
    // a tight cluster: 29 docs share one token set; doc 29 is a tiny
    // perturbation of it (same centroid codes -> phase-1 scores tie, the
    // deterministic tie-break is doc_id asc, so doc 29 always falls below
    // a small fixed cut — the q97 mechanism, synthesized)
    val base = Seq.fill(3)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val bump = base.map(_.map(v => v + 0.01f))
    val corpus: Map[Long, Seq[Seq[Float]]] =
      (0L until 29L).map(_ -> base).toMap + (29L -> bump)
    val path = java.nio.file.Files.createTempDirectory("idx_adaptive").toString
    val idx = IndexIVF.create(spark, path, GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 2, numIterations = 4))))
    val docs = corpus.toSeq.sortBy(_._1).map { case (i, t) => Doc(i, t, "x", 0L) }
      .toDF().select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert"))
    idx.train(docs)
    idx.add(1, docs)

    val opts = SearchOptions(kTopCentroids = 2, nProbe = 2, numSecondPass = 4)
    val queriesDf = Seq((29L, bump)).toDF("query_id", "tokens")
    def hits(): Seq[Long] =
      BatchSearcher.searchBatch(idx, 1, "colbert", queriesDf, k = 3, opts)
        .collect().map(_.getLong(1)).toSeq

    val fixed = hits()
    assert(!fixed.contains(29L),
      s"fixture broken: the fixed nsp=4 cut should drop doc 29, got $fixed")
    spark.conf.set(BatchSearcher.NspEscalateKey, "32")
    try {
      val adaptive = hits()
      assert(adaptive.head == 29L,
        s"escalation must readmit the true doc to rank 1, got $adaptive")
    } finally spark.conf.unset(BatchSearcher.NspEscalateKey)
  }

  test("cached context-codes snapshot: identical to the per-batch BHJ " +
      "shape, and a mutation invalidates it") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(21)
    def tokens() = Seq.fill(4)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val corpus = (0L until 40L).map(i => i -> tokens()).toMap
    val path = java.nio.file.Files.createTempDirectory("idx_ctxcache").toString
    val idx = IndexIVF.create(spark, path, GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 6, numIterations = 4))))
    val docs = corpus.toSeq.sortBy(_._1).map { case (i, t) => Doc(i, t, "x", 0L) }
      .toDF().select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert"))
    idx.train(docs)
    idx.add(1, docs)

    val opts = SearchOptions(kTopCentroids = 3, nProbe = 6)
    val queriesDf = Seq(5L, 17L, 31L).map(qid => (qid, corpus(qid)))
      .toDF("query_id", "tokens")
    def run(): Map[Long, Seq[(Long, Double)]] =
      BatchSearcher.searchBatch(idx, 1, "colbert", queriesDf, k = 5, opts)
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap

    val cachedShape = run()
    val cachedAgain = run() // second batch rides the cache — same rows
    assert(cachedAgain == cachedShape, "cache-hit batch diverged")
    spark.conf.set(BatchSearcher.CtxBroadcastCacheKey, "false")
    try assert(run() == cachedShape,
      "per-batch BHJ shape diverged from the cached-snapshot shape")
    finally spark.conf.unset(BatchSearcher.CtxBroadcastCacheKey)

    // phase-2 multiget shape switch: forcing the big-pool broadcast
    // left-semi join (threshold 0, point store disabled — the store path
    // has its own A/B in PointStoreSpec) must return the exact rows the
    // doc_id IN-list path returns, and the ids must arrive as a
    // BROADCAST left-semi (a shuffled semi over the pool would defeat
    // the point of the switch)
    spark.conf.set(BatchSearcher.MaxDocIdInListKey, "0")
    spark.conf.set(BatchSearcher.PointStoreKey, "false")
    try {
      val df = BatchSearcher.searchBatch(idx, 1, "colbert", queriesDf, 5, opts)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"threshold 0 must route the multiget through a semi-join:\n$plan")
      // assert the POSITIVE physical shape, not just the absence of
      // SortMergeJoin: a planner change dropping the broadcast hint to a
      // ShuffledHashJoin left-semi would invert the switch's win while
      // still passing a no-SMJ check (r17 ADVICE) — every LeftSemi in the
      // plan must execute as a BroadcastHashJoin
      plan.linesIterator.filter(_.contains("LeftSemi")).foreach { l =>
        assert(l.contains("BroadcastHashJoin"),
          s"LeftSemi must be a BroadcastHashJoin, got: $l\n$plan")
      }
      assert(run() == cachedShape,
        "semi-join multiget diverged from the IN-list multiget")
    } finally {
      spark.conf.unset(BatchSearcher.MaxDocIdInListKey)
      spark.conf.unset(BatchSearcher.PointStoreKey)
    }

    // freshness: an add() on this handle must invalidate the snapshot —
    // a query matching ONLY the new doc has to find it in the next batch
    val newToks = corpus(5L).map(_.map(v => v + 0.001f)) // lands near doc 5
    idx.add(1, Seq(Doc(100L, newToks, "x", 0L)).toDF()
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert")))
    val after = BatchSearcher.searchBatch(idx, 1, "colbert",
      Seq((5L, corpus(5L))).toDF("query_id", "tokens"), k = 10, opts)
      .collect().map(_.getLong(1)).toSet
    assert(after.contains(100L),
      s"doc added after the snapshot build must be visible, got $after")
  }

  test("inverted walk: identical rows to the scan shape, and steady " +
      "phase-1 touches no postings files") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(33)
    def tokens() = Seq.fill(4)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val corpus = (0L until 50L).map(i => i -> tokens()).toMap
    val path = java.nio.file.Files.createTempDirectory("idx_walk").toString
    val idx = IndexIVF.create(spark, path, GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 6, numIterations = 4))))
    val docs = corpus.toSeq.sortBy(_._1).map { case (i, t) => Doc(i, t, "x", 0L) }
      .toDF().select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert"))
    idx.train(docs)
    idx.add(1, docs)

    val opts = SearchOptions(kTopCentroids = 3, nProbe = 6)
    val queriesDf = Seq(4L, 19L, 42L).map(qid => (qid, corpus(qid)))
      .toDF("query_id", "tokens")
    def run(): (Map[Long, Seq[(Long, Double)]], String) = {
      val df = BatchSearcher.searchBatch(idx, 1, "colbert", queriesDf, 5, opts)
      val rows = df.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
      (rows, df.queryExecution.executedPlan.toString)
    }

    val (walked, _) = run() // InvertedWalkKey defaults true
    spark.conf.set(BatchSearcher.InvertedWalkKey, "false")
    try {
      val (scanShape, _) = run()
      assert(scanShape == walked,
        "inverted walk diverged from the postings-scan shape")
    } finally spark.conf.unset(BatchSearcher.InvertedWalkKey)

    // plan pin: with the rerank multiget off the returned frame keeps the
    // FULL lineage (the multiget collects the pool eagerly, hiding
    // phase-1 from the final plan), so the phase-1 shape is assertable:
    // the walk must not reference the postings relation anywhere (its
    // `centroid_bucket` column is the marker — no other table has one),
    // the hatch must (canary that the marker still detects the scan)
    spark.conf.set(BatchSearcher.RerankMultigetKey, "false")
    try {
      val (walkRows, walkPlan) = run()
      assert(walkRows == walked, "multiget-off walk shape diverged")
      assert(!walkPlan.contains("centroid_bucket"),
        s"the walk shape must not scan the postings table:\n$walkPlan")
      spark.conf.set(BatchSearcher.InvertedWalkKey, "false")
      try {
        val (scanRows, scanPlan) = run()
        assert(scanRows == walked, "multiget-off scan shape diverged")
        assert(scanPlan.contains("centroid_bucket"),
          "the hatch must restore the postings-scan shape (plan-pin canary)")
      } finally spark.conf.unset(BatchSearcher.InvertedWalkKey)
    } finally spark.conf.unset(BatchSearcher.RerankMultigetKey)

    // freshness rides the snapshot's own invalidation: a new doc is
    // visible to the walk's next batch (the inverted view hangs off the
    // rebuilt CtxCodes)
    idx.add(1, Seq(Doc(200L, corpus(4L).map(_.map(_ + 0.001f)), "x", 0L)).toDF()
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert")))
    val after = BatchSearcher.searchBatch(idx, 1, "colbert",
      Seq((4L, corpus(4L))).toDF("query_id", "tokens"), k = 10, opts)
      .collect().map(_.getLong(1)).toSet
    assert(after.contains(200L),
      s"doc added after the walk's snapshot build must be visible, got $after")
  }

  test("warmBatchCaches pre-builds the snapshot so the serving call is a " +
      "cache hit, and results match an unwarmed batch") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(55)
    def tokens() = Seq.fill(4)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val corpus = (0L until 25L).map(i => i -> tokens()).toMap
    val path = java.nio.file.Files.createTempDirectory("idx_warm").toString
    val idx = IndexIVF.create(spark, path, GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 4, numIterations = 4))))
    val docs = corpus.toSeq.sortBy(_._1).map { case (i, t) => Doc(i, t, "x", 0L) }
      .toDF().select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert"))
    idx.train(docs)
    idx.add(1, docs)

    idx.warmBatchCaches(1, "colbert")
    // the snapshot must already be cached: a direct serving-path request
    // returns a broadcast created BEFORE this marker (no new build)
    val marker = spark.sparkContext.broadcast(Array(0)).id
    val (rows, bytes) = BatchSearcher.contextRelationStats(idx, 1, "colbert")
    val served = idx.contextCodesBroadcast(1, "colbert", rows, bytes, 1L << 30)
    assert(served.id < marker,
      s"serving call built a NEW broadcast (id ${served.id} >= $marker) — " +
        "warmBatchCaches did not pre-build the snapshot")

    // warm is idempotent AND jobless on repeat: the overlapped store/
    // snapshot builds (warm runs them concurrently — guide §2.6) must both
    // be cache hits the second time, independent of which finished first
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      idx.warmBatchCaches(1, "colbert")
      Thread.sleep(800) // listener events drain asynchronously
      assert(jobs.get() == 0,
        s"repeat warmBatchCaches ran ${jobs.get()} jobs — the overlapped " +
          "builds must be idempotent cache hits")
    } finally spark.sparkContext.removeSparkListener(l)

    val opts = SearchOptions(kTopCentroids = 2, nProbe = 4)
    val q = Seq((3L, corpus(3L))).toDF("query_id", "tokens")
    val hits = BatchSearcher.searchBatch(idx, 1, "colbert", q, k = 3, opts)
      .collect().map(_.getLong(1)).toSeq
    assert(hits.headOption.contains(3L), s"self-query must rank doc 3 first: $hits")
  }

  test("snapshot cache: a same-row-count mutation through a SIBLING handle " +
      "in the same JVM invalidates this handle's snapshot (JVM-global tick)") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(33)
    def tokens() = Seq.fill(4)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val corpus = (0L until 30L).map(i => i -> tokens()).toMap
    val path = java.nio.file.Files.createTempDirectory("idx_siblingtick").toString
    val idx = IndexIVF.create(spark, path, GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 6, numIterations = 4))))
    def df(rows: Seq[(Long, Seq[Seq[Float]])]) =
      rows.map { case (i, t) => Doc(i, t, "x", 0L) }.toDF()
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("colbert"))
    idx.train(df(corpus.toSeq.sortBy(_._1)))
    idx.add(1, df(corpus.toSeq.sortBy(_._1)))

    val opts = SearchOptions(kTopCentroids = 3, nProbe = 6)
    val q = Seq((7L, corpus(7L))).toDF("query_id", "tokens")
    def top(): Long = BatchSearcher
      .searchBatch(idx, 1, "colbert", q, k = 1, opts)
      .collect().head.getLong(1)
    assert(top() == 7L, "self-query must rank doc 7 first") // snapshot cached

    // update doc 7 through a SIBLING handle: the row COUNT is unchanged
    // (tombstone + re-add), so only the JVM-global mutation tick can
    // invalidate the first handle's snapshot — a per-handle tick serves
    // doc 7's STALE codes and still ranks it first
    val sibling = IndexIVF.open(spark, path)
    val far = corpus(25L).map(_.map(v => -v)) // far from the query
    sibling.update(1, df(Seq(7L -> far)))
    assert(top() != 7L,
      "sibling-handle update must invalidate the snapshot cache: doc 7's " +
        "new tokens are far from the query, yet it still ranked first " +
        "(stale codes served)")

    // sibling handles must SHARE the snapshot (JVM-global cache, r17
    // ADVICE): after this handle's batch rebuilt it, a serving-path
    // request through the sibling must return the same broadcast, not
    // build a duplicate
    val (rows, bytes) = BatchSearcher.contextRelationStats(idx, 1, "colbert")
    val mine = idx.contextCodesBroadcast(1, "colbert", rows, bytes, 1L << 30)
    val theirs = sibling.contextCodesBroadcast(1, "colbert", rows, bytes, 1L << 30)
    assert(mine.id == theirs.id,
      s"sibling handles built duplicate snapshots (${mine.id} vs ${theirs.id})")
  }

  test("snapshot cache: a FOREIGN-PROCESS write (persisted epoch advanced " +
      "behind every in-process handle's back) invalidates on the next batch") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(44)
    def tokens() = Seq.fill(4)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val corpus = (0L until 20L).map(i => i -> tokens()).toMap
    val path = java.nio.file.Files.createTempDirectory("idx_foreignepoch").toString
    val idx = IndexIVF.create(spark, path, GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 4, numIterations = 4))))
    val docs = corpus.toSeq.sortBy(_._1).map { case (i, t) => Doc(i, t, "x", 0L) }
      .toDF().select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert"))
    idx.train(docs)
    idx.add(1, docs)

    val (rows, bytes) = BatchSearcher.contextRelationStats(idx, 1, "colbert")
    def snap() = idx.contextCodesBroadcast(1, "colbert", rows, bytes, 1L << 30)
    val first = snap()
    // steady state: the per-call epoch probe must NOT rebuild by itself
    assert(snap().id == first.id, "epoch probe rebuilt an unchanged snapshot")

    // simulate a writer in ANOTHER PROCESS: advance _meta/epoch.json on
    // disk directly — no in-process write lock runs, so the JVM-global
    // mutation tick cannot see it and the row count happens to be
    // unchanged (the same-count-update shape); only the persisted-epoch
    // probe can catch this
    graft.core.Json.write(s"$path/_meta/epoch.json",
      Map("epoch" -> (idx.currentEpoch() + 1L)))
    val after = snap()
    assert(after.id != first.id,
      "a foreign-process epoch advance must invalidate the snapshot cache " +
        s"on the next batch (still serving broadcast ${first.id})")
    assert(snap().id == after.id, "rebuilt snapshot must then be stable")
  }

  test("context gate stats are cached: no jobs on a steady-state repeat, " +
      "recompute after an add and after a foreign epoch bump") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(55)
    def tokens() = Seq.fill(4)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val path = java.nio.file.Files.createTempDirectory("idx_statscache").toString
    val idx = IndexIVF.create(spark, path, GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 4, numIterations = 4))))
    def docsDf(ids: Seq[Long]) = ids.map(i => Doc(i, tokens(), "x", 0L)).toDF()
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("colbert"))
    val docs = docsDf(0L until 15L)
    idx.train(docs)
    idx.add(1, docs)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val s1 = BatchSearcher.contextRelationStats(idx, 1, "colbert")
    assert(s1._1 == 15L)
    spark.sparkContext.addSparkListener(l)
    try {
      val s2 = BatchSearcher.contextRelationStats(idx, 1, "colbert")
      Thread.sleep(800) // listener events drain asynchronously
      assert(s2 == s1, "cached stats diverged from the measured stats")
      assert(jobs.get() == 0,
        s"steady-state stats repeat ran ${jobs.get()} jobs — the cache " +
          "must serve them jobless (0.27 s/batch at the 10M shape)")
      // an in-process mutation (tick bump) must recompute: rows grow
      idx.add(1, docsDf(100L until 105L))
      assert(BatchSearcher.contextRelationStats(idx, 1, "colbert")._1 == 20L,
        "stats served stale after an add through this handle")
      // a FOREIGN-process write (epoch bumped on disk, tick unmoved, rows
      // coincidentally unchanged) must also recompute — same hole the
      // snapshot's epoch probe closes
      graft.core.Json.write(s"$path/_meta/epoch.json",
        Map("epoch" -> (idx.currentEpoch() + 1L)))
      val before = jobs.get()
      val s4 = BatchSearcher.contextRelationStats(idx, 1, "colbert")
      Thread.sleep(800)
      assert(s4._1 == 20L)
      assert(jobs.get() > before,
        "a foreign epoch advance must force a stats recompute")
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
