package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic assertions for the oracle-free dedup/fingerprint queries (the
  * driver only checks rows for these; the semantics live here). The sf0.001
  * documents table has planted near-duplicate pairs (shingle Jaccard ~0.99),
  * which the exact inverted-index pass, MinHash LSH, and SimHash must all
  * surface. */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  lazy val exactPairs: Set[(Long, Long)] = run("q_neardup_jaccard")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact shingle-Jaccard finds the planted near-dup pairs") {
    assert(exactPairs.nonEmpty, "generator plants near-duplicates")
    // ids are ordered and scores within [0.8, 1]
    val rows = run("q_neardup_jaccard").collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0))
  }

  test("size-bound prefilter is recall-lossless: boundary pair at exactly " +
      "J = 0.8 survives, and pruned == unpruned on the corpus") {
    import spark.implicits._
    // A (6 words) has 4 distinct 3-shingles, all contained in B's 5
    // (7 words): J = 4 / 5 = 0.8 EXACTLY, with sizes (4, 5) sitting on the
    // size bound min/max = 0.8 — the pair double rounding would drop
    // without the slack (0.8 x 5 > 4.0 in binary)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val pruned = graft.queries.TextPipeline
      .jaccardPairs(spark, docs, minJaccard = Some(0.8))
      .filter(org.apache.spark.sql.functions.col("jaccard_raw") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
    assert(pruned.toSeq == Seq((1L, 2L, 0.8)),
      s"boundary pair must survive the size prefilter: ${pruned.toSeq}")

    // on the real corpus: the prefiltered pipeline must emit EXACTLY the
    // unpruned >= 0.8 rows (the bound is an upper bound on J — provable
    // recall, unlike a signature-estimate prefilter)
    val base = graft.queries.TextPipeline
      .jaccardPairs(spark, graft.queries.Tables.t(spark, sf, "documents"))
      .filter(org.apache.spark.sql.functions.col("jaccard_raw") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs == base,
      "size-pruned q_neardup_jaccard diverged from the unpruned pipeline")
  }

  test("sizeCompatible predicate: boundary admitted (with slack), " +
      "incompatible denied") {
    import org.apache.spark.sql.functions._
    def eval(t: Double, a: Long, b: Long): Boolean =
      spark.range(1).select(graft.queries.TextPipeline
        .sizeCompatible(t)(lit(a), lit(b)).as("ok")).head.getBoolean(0)
    // exact boundary: J <= min/max == t must be ADMITTED (it could reach t)
    assert(eval(0.5, 1L, 2L), "J-bound exactly at t must survive")
    assert(eval(0.8, 4L, 5L), "the 0.8 x 5 > 4.0 binary-rounding boundary " +
      "must survive via the slack")
    // strictly incompatible: min/max < t cannot reach t
    assert(!eval(0.5, 1L, 3L), "min/max = 1/3 < 0.5 must be pruned")
    assert(!eval(0.8, 3L, 5L), "min/max = 0.6 < 0.8 must be pruned")
    // symmetric in its arguments
    assert(eval(0.5, 2L, 1L) && !eval(0.5, 3L, 1L))
  }

  test("minhash verify size-bound prune is recall-lossless: " +
      "q_dedup_minhash == the unpruned verify pipeline") {
    import org.apache.spark.sql.functions._
    import graft.queries.{QueryDef, TextPipeline}
    val d = graft.queries.Tables.t(spark, sf, "documents")
    val arrs = TextPipeline.shingleArrays(d)
    val sigs = TextPipeline.minhashSigs(arrs, 32)
    val candPairs = TextPipeline.minhashCandidates(spark, sigs, 8, 4)
    val sh = arrs.select(col("doc_id"), explode(col("shs")).as("sh"))
    // the pre-r18 unpruned verify: every banded candidate re-joined
    val common = candPairs
      .join(sh.select(col("doc_id").as("a_id"), col("sh")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh")), Seq("b_id", "sh"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("common"))
    val cnts = sigs.select(col("doc_id"), col("cnt"))
    val unpruned = common
      .join(cnts.select(col("doc_id").as("a_id"), col("cnt").as("ca")), Seq("a_id"))
      .join(cnts.select(col("doc_id").as("b_id"), col("cnt").as("cb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("common") * lit(1.0) / (col("ca") + col("cb") - col("common")))
          .as("jr"))
      .filter(col("jr") >= 0.5)
      .select(col("a_id"), col("b_id"), QueryDef.floorRound(col("jr"), 4).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pruned = run("q_dedup_minhash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned == unpruned,
      "size-pruned q_dedup_minhash diverged from the unpruned verify")
    assert(pruned.nonEmpty, "planted near-dups must keep the pin non-vacuous")
  }

  /** pairs similar enough that LSH banding must catch them (see the
    * miss-probability notes on the band layouts in TextPipeline). */
  lazy val verySimilar: Set[(Long, Long)] = run("q_neardup_jaccard")
    .collect().filter(_.getDouble(2) >= 0.95)
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash LSH candidates recover the >=0.95 pairs") {
    val lsh = run("q_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 bands x 4 rows: P[miss] = (1-s^4)^8 ~ 1.4e-6 at s=0.95
    val missed = verySimilar -- lsh
    assert(missed.isEmpty, s"LSH missed very-similar pairs: $missed")
    assert(verySimilar.nonEmpty)
  }

  test("8x4 banding cuts sub-threshold candidates vs 8x2 without losing recall") {
    import spark.implicits._
    import graft.queries.TextPipeline
    // 80 planted pairs at shingle-jaccard ~0.39 (below the >=0.5 output
    // filter: 12 of 20 tokens shared) plus 20 pairs at ~0.93 (29 of 30
    // tokens shared). 8x2's collision threshold (~0.35) admits most of the
    // sub-threshold pairs as candidates — work the exact verify then throws
    // away; 8x4 (~0.59) filters them at the banding stage, which is the
    // whole point of the geometry change.
    val low = (0 until 80).flatMap { i =>
      val base = (0 until 20).map(j => s"p${i}w$j")
      Seq((2L * i, base.mkString(" ")),
        (2L * i + 1, (base.take(12) ++ (12 until 20).map(j => s"p${i}x$j")).mkString(" ")))
    }
    val hi = (0 until 20).flatMap { i =>
      val base = (0 until 30).map(j => s"h${i}w$j")
      Seq((1000L + 2 * i, base.mkString(" ")),
        (1001L + 2 * i, (base.init :+ s"h${i}z").mkString(" ")))
    }
    val df = (low ++ hi).toDF("doc_id", "text")
    val sigs = TextPipeline.minhashSigs(TextPipeline.shingleArrays(df), 32)
      .persist()
    try {
      def cands(rows: Int): Set[(Long, Long)] =
        TextPipeline.minhashCandidates(spark, sigs, 8, rows)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val c82 = cands(2)
      val c84 = cands(4)
      assert(c84.size < c82.size,
        s"8x4 must admit fewer sub-threshold candidates (8x2=${c82.size}, 8x4=${c84.size})")
      val hiPairs = (0 until 20).map(i => (1000L + 2 * i, 1001L + 2 * i)).toSet
      assert((hiPairs -- c84).isEmpty,
        s"8x4 lost high-similarity pairs: ${hiPairs -- c84}")
    } finally { sigs.unpersist(); () }
  }

  test("minhash min-band candidate dedup: set-equal to the anti-join + " +
      "distinct shape on a corpus with multi-band collisions AND a capped " +
      "cluster, each pair emitted exactly once") {
    import spark.implicits._
    import graft.queries.TextPipeline
    import org.apache.spark.sql.functions._
    // 6 identical docs (collide in EVERY band — the multi-band multiplicity
    // the old distinct() laundered), 3 near-dups, and a 40-doc exact-dup
    // mega-cluster that exceeds the cap (its buckets must be dropped on
    // BOTH shapes, in every band)
    val cluster = (100L until 140L).map(i =>
      i -> (0 until 25).map(j => s"mega w$j").mkString(" "))
    val docs = ((0L until 6L).map(i =>
        i -> (0 until 25).map(j => s"same w$j").mkString(" ")) ++
      Seq(50L -> (0 until 25).map(j => s"near w$j").mkString(" "),
        51L -> ((0 until 24).map(j => s"near w$j") :+ "tail").mkString(" "),
        60L -> (0 until 25).map(j => s"other v$j").mkString(" ")) ++
      cluster).toDF("doc_id", "text")
    val (bands, rows, cap) = (8, 4, 16)
    val sigs = TextPipeline.minhashSigs(TextPipeline.shingleArrays(docs),
      bands * rows).persist()
    try {
      val fast = TextPipeline.minhashCandidates(spark, sigs, bands, rows, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fast.distinct == fast,
        s"min-band conjunct must emit each candidate pair exactly once")
      // reference: the old shape — posexplode band rows, hot-bucket
      // anti-join, self-join, pair distinct
      val b = sigs.select(col("doc_id"),
        posexplode(array((0 until bands).map(i =>
          xxhash64((0 until rows).map(r => col(s"h${rows * i + r}")): _*)): _*))
          .as(Seq("band", "bucket")))
      val hotB = b.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("bc")).filter(col("bc") > cap)
        .select("band", "bucket")
      val banded = b.join(broadcast(hotB), Seq("band", "bucket"), "left_anti")
      val reference = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast.toSet == reference,
        s"min-band candidates diverged from the anti-join + distinct shape: " +
          s"extra=${fast.toSet -- reference} missing=${reference -- fast.toSet}")
      // fixture sanity: the identical docs DID pair, the mega-cluster was
      // capped away, and the cap actually fired
      assert(fast.toSet.contains((0L, 1L)), "identical docs must pair")
      assert(!fast.toSet.exists(p => p._1 >= 100L && p._1 < 140L),
        "mega-cluster pairs must be dropped by the cap")
      assert(TextPipeline.droppedHotKeys("q_dedup_minhash") > 0,
        "the hot-bucket cap must tick DropLog in array form")
    } finally { sigs.unpersist(); () }
  }

  test("SimHash bands recover the >=0.95 pairs with small hamming") {
    val sim = run("q_dedup_simhash").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val missed = verySimilar.filterNot(sim.contains)
    assert(missed.isEmpty, s"SimHash missed very-similar pairs: $missed")
    sim.values.foreach(h => assert(h <= 8))
  }

  test("simhash min-band dedup: multi-band collisions emit exactly one row, " +
      "set-equal to the pair-distinct shape, no aggregate in the plan") {
    import spark.implicits._
    import graft.queries.TextPipeline
    import org.apache.spark.sql.functions.{col, bit_count}
    // identical texts collide in EVERY band; the near-identical pair in
    // several — the exact multiplicity the old distinct() laundered
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "omega psi chi phi upsilon tau sigma rho")).toDF("doc_id", "text")
    val fastDf = TextPipeline.simhashPairs(docs, bandBits = 8, maxHamming = 8)
    val fast = fastDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(fast.distinct == fast,
      s"min-band filter must emit each colliding pair exactly once: $fast")
    // reference: the join + pair-distinct shape this rewrite replaced
    val bands = TextPipeline.simhashBands(docs, 8)
    val reference = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= 8)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fast.toSet == reference,
      s"min-band dedup diverged from the distinct shape: " +
        s"${fast.toSet} vs $reference")
    assert(fast.toSet.contains((1L, 2L, 0)), "identical docs must pair at hamming 0")
    // plan pin: the pipeline has NO aggregate left — the pair dedup is a
    // row-local join conjunct, so the only exchange is the band shuffle
    val plan = fastDf.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate") &&
      !plan.contains("ObjectHashAggregate"),
      s"pair dedup must not be an aggregate:\n$plan")
  }

  test("shingling + MinHash signatures shuffle nothing (scale invariant)") {
    import graft.queries.{Tables, TextPipeline}
    // per-doc array_distinct dedup and array_min signature projections are
    // row-local: the ONLY exchange allowed before banding is spread()'s
    // round-robin repartition of the small scan (an identity at real scale).
    // A hash/range exchange appearing here would mean the token-level
    // shuffle crept back into the 100 TB path.
    val sigs = TextPipeline.minhashSigs(
      TextPipeline.shingleArrays(Tables.t(spark, sf, "documents")))
    val p = sigs.queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("repetition signals shuffle nothing; decontamination probe broadcasts (scale invariants)") {
    // q_quality_repetition: every signal is a per-row collection expression
    // — the ONLY exchange in the whole plan is the final orderBy's range
    // partition (deterministic output order for the oracle compare). A hash
    // exchange appearing would mean a token-level groupBy crept in.
    val rep = graft.SparkEntry.queries("q_quality_repetition")(spark, sf)
    val repPlan = rep.queryExecution.executedPlan.toString
    assert(!repPlan.contains("hashpartitioning"), repPlan)
    // q_decontaminate: the benchmark membership probe must be a broadcast
    // join, never a sort-merge join — at 100 TB the corpus-side shingle
    // stream cannot be shuffled by shingle string
    val dec = graft.SparkEntry.queries("q_decontaminate")(spark, sf)
    val decPlan = dec.queryExecution.executedPlan.toString
    assert(!decPlan.contains("SortMergeJoin"), decPlan)
    assert(decPlan.contains("BroadcastHashJoin"), decPlan)
    // q_source_cap ships the PLAIN window + rank filter because Catalyst's
    // InferWindowGroupLimit plans it as a partial PRE-SHUFFLE group limit
    // (split-bounded sorts, k rows per source per map task) plus a final
    // one — the optimizer-native two-phase. Pin BOTH group limits: if a
    // future shape change stops the rule matching, a hot source would
    // silently go back to sorting in one task.
    val cap = graft.SparkEntry.queries("q_source_cap")(spark, sf)
    val capPlan = cap.queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(capPlan).size >= 2, capPlan)
  }

  test("materializeSelected writes every curated doc in every split, hive-partitioned") {
    import graft.queries.TextPipeline
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("corpus_out").toString
    val counts = TextPipeline.materializeSelected(spark, sf, out)
    // ground truth from the verdict query itself: content gates only —
    // split membership is an assignment, not a gate (a `selected` filter
    // would silently drop every curated val/test doc)
    val verdict = graft.SparkEntry.queries("q_corpus_select_full")(spark, sf)
      .filter(col("lang_ok") && col("quality_ok") && col("dedup_keep") &&
        col("clean") && col("mix_keep") && col("cap_kept"))
      .select("doc_id", "split")
    val expected = verdict.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == expected, s"materialized counts $counts != verdict $expected")
    // the corpus actually has curated val/test docs, and they materialize
    assert(expected.keySet == Set("train", "val", "test"),
      s"corpus should curate docs in all three splits, got $expected")
    // layout: one directory per split, pruning works, ids match exactly
    val re = spark.read.parquet(out)
    assert(re.columns.contains("split"))
    val trainIds = re.filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectedTrain = verdict.filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds == expectedTrain)
    // the train partition is exactly the verdict's `selected` set — the
    // training-set semantics are unchanged by the every-split fix
    val selectedIds = graft.SparkEntry.queries("q_corpus_select_full")(spark, sf)
      .filter(col("selected")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(trainIds == selectedIds)
    // within-file doc_id order (deterministic shard reads): each file's ids
    // must arrive sorted
    val files = new java.io.File(out).listFiles().filter(_.getName.startsWith("split="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"${f.getName} not in doc_id order")
    }
  }

  test("decontaminate() audits against a caller-supplied benchmark set (both schemas)") {
    import graft.queries.TextPipeline
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def w(c: Char, n: Int) = (1 to n).map(i => s"$c$i")
    val benchWords = w('b', 8) // exactly one 8-token shingle
    val corpus = Seq(
      (1L, (w('a', 4) ++ benchWords).mkString(" ")), // 12 toks, 5 shingles, 1 hit
      (2L, w('c', 12).mkString(" ")),                // 5 shingles, 0 hits
      (3L, (benchWords ++ w('d', 1)).mkString(" ")), // 2 shingles, 1 hit
      (4L, w('e', 3).mkString(" "))                  // below the window: always clean
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .toSeq
    // raw-text benchmark schema: shingled by the same kernel as the corpus
    val viaText = rows(TextPipeline.decontaminate(
      corpus, Seq(Tuple1(benchWords.mkString(" "))).toDF("text")))
    assert(viaText == Seq(
      (1L, 1L, 5L, 200L, true),  // floor(1 * 1000 / 5)
      (2L, 0L, 5L, 0L, false),
      (3L, 1L, 2L, 500L, true),
      (4L, 0L, 0L, 0L, false)))
    // ready-shingle benchmark schema must agree exactly
    val viaSh = rows(TextPipeline.decontaminate(
      corpus, Seq(Tuple1(benchWords.mkString(" "))).toDF("sh")))
    assert(viaSh == viaText)
    // the probe stays a broadcast join (the 100 TB contract)
    val plan = TextPipeline.decontaminate(
      corpus, Seq(Tuple1(benchWords.mkString(" "))).toDF("sh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"), plan)
  }

  test("shingle/signature UDF kernels are bit-identical to the HOF formulation") {
    import org.apache.spark.sql.functions._
    import graft.queries.{Tables, TextPipeline}
    val d = Tables.t(spark, sf, "documents").limit(100)
    // reference: the builtin-function chain the kernels replaced
    val hofArrs = d.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(t) - 3), i -> xxhash64(concat_ws(' ', slice(t, i + 1, 3))))"))
        .as("shs"))
    val hofSigs = hofArrs.select(col("doc_id") +:
      (0 until 16).map(i =>
        array_min(transform(col("shs"), x => xxhash64(lit(i), x))).as(s"h$i")): _*)
    val kernelArrs = TextPipeline.shingleArrays(d)
    def arrMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(arrMap(kernelArrs) == arrMap(hofArrs))
    def sigMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id") +: (0 until 16).map(i => col(s"h$i")): _*)
        .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
    assert(sigMap(TextPipeline.minhashSigs(kernelArrs)) == sigMap(hofSigs))
  }

  test("shingle kernel parity holds on adversarial whitespace and unicode") {
    import org.apache.spark.sql.functions._
    // the clean test corpora contain none of these; the kernel must still
    // match the builtin split/concat_ws/xxhash64 formulation exactly
    // (trailing separators once diverged: Java's default split drops
    // trailing empty tokens, Spark's keeps them)
    val rnd = new scala.util.Random(7)
    val words = Seq("a", "bb", "ccc", "é", "ü", "ß", "日本", "x1", "", "Z")
    val fuzz = (0 until 200).map { _ =>
      (0 until rnd.nextInt(8)).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" " * (1 + rnd.nextInt(2)))
    }
    val cases = Seq("", " ", "  ", "a b", "a b c", "a b c ", " a b c",
      "a  b c", "a b  c d", "é ü ß", "a b c d e  ") ++ fuzz
    import spark.implicits._
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val both = df.select(col("doc_id"),
      graft.functions.TextHash.hashedShingles3(col("text")).as("kernel"),
      expr("""CASE WHEN size(split(text, ' ')) >= 3 THEN
                array_distinct(transform(sequence(0, size(split(text, ' ')) - 3),
                  i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i + 1, 3)))))
              ELSE NULL END""").as("hof"))
    both.collect().foreach { r =>
      val kernel = Option(r.getSeq[Long](1)).map(_.toSeq)
      val hof = Option(r.getSeq[Long](2)).map(_.toSeq)
      assert(kernel == hof,
        s"kernel/builtin divergence for text '${cases(r.getLong(0).toInt)}': $kernel vs $hof")
    }
    // the zero-copy simhash expression must match the UDF-over-split-tokens
    // formulation on the same adversarial corpus (signed-byte XOR, empty
    // tokens from consecutive/trailing spaces, multibyte utf8)
    df.select(col("doc_id"),
      graft.functions.SimHash64Text(col("text")).as("kernel"),
      graft.functions.TextHash.simhash64(split(col("text"), " ")).as("udf"))
      .collect().foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"simhash divergence for text '${cases(r.getLong(0).toInt)}'")
      }
  }

  test("train/val/test split is stable under corpus growth and roughly 90/5/5") {
    import spark.implicits._
    def splits(df: org.apache.spark.sql.DataFrame): Map[Long, String] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_split").toFile
      try {
        df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
        run2("q_train_split", dir.toString).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    val small = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val grown = (0L until 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = splits(small)
    val b = splits(grown)
    // growth must never reshuffle existing assignments (the whole point
    // vs a rand() split — no val/test leakage into train on re-runs)
    assert(a.forall { case (id, s) => b(id) == s })
    val frac = b.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03, s"$frac")
    assert(math.abs(frac("val") - 0.05) < 0.02, s"$frac")
    assert(math.abs(frac("test") - 0.05) < 0.02, s"$frac")
  }

  test("corpus selection composes its component operators consistently") {
    val sel = run("q_corpus_select").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(3), r.getString(4), r.getBoolean(5))).toMap
    val clusters = run("q_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val splits = run("q_train_split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sel.keySet == clusters.keySet)
    sel.foreach { case (id, (keep, split, selected)) =>
      assert(keep == clusters(id), s"doc $id: keep disagrees with q_dedup_clusters")
      assert(split == splits(id), s"doc $id: split disagrees with q_train_split")
      if (selected) assert(keep && split == "train")
    }
    // the dedup gate must actually fire on this corpus (planted dups)
    assert(sel.values.exists(!_._1), "expected some non-keeper docs")
  }

  test("packed sequences reconstruct the corpus exactly at fixed length") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val seqs = graft.queries.TextPipeline.packedSequences(docs)
      .orderBy("seq_id").collect()
    // dense ids from 0, every sequence but the last exactly PackTokens
    assert(seqs.head.getLong(0) == 0L)
    assert(seqs.map(_.getLong(0)).toSeq == (0L until seqs.length).toSeq)
    val lens = seqs.map(_.getLong(1))
    assert(lens.init.forall(_ == 1024L), "all but the last are full sequences")
    assert(lens.last <= 1024L && lens.last >= 1L)
    // concatenating the sequences reproduces the doc_id-ordered corpus
    // token for token — the whole pipeline (two-phase prefix sum, fragment
    // slicing, offset-ordered reassembly) verified as one string equality
    val fromSeqs = seqs.map(_.getString(2)).mkString(" ")
    val fromDocs = docs.orderBy("doc_id").select(col("text"))
      .collect().map(_.getString(0)).mkString(" ")
    assert(fromSeqs == fromDocs)
  }

  test("fingerprints are deterministic and discriminate distinct content") {
    val a = run("q_fingerprint").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = run("q_fingerprint").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "stable across runs")
    // all sf0.001 texts are distinct -> all content fingerprints distinct
    assert(a.values.toSet.size == a.size)
  }

  test("language id picks en for this corpus (markers present)") {
    val langs = run("q_lang_id").collect().map(_.getString(2)).toSet
    assert(langs == Set("en"))
  }

  test("shingle df-cap kills quadratic pair expansion from a hot stop-phrase") {
    import spark.implicits._
    // 300 docs all sharing one stop-phrase shingle, unique tails otherwise:
    // the adversarial input where the inverted-index self-join goes
    // quadratic on a single key
    val hotDocs = (0 until 300)
      .map(i => (i.toLong, s"common stop phrase w$i x$i y$i"))
      .toDF("doc_id", "text")
    // uncapped: every pair shares the stop shingle -> n(n-1)/2 pairs
    val uncapped = graft.queries.TextPipeline
      .jaccardPairs(spark, hotDocs, dfCap = Int.MaxValue).count()
    assert(uncapped == 300L * 299 / 2)
    // capped: the stop shingle is dropped; nothing else is shared
    val capped = graft.queries.TextPipeline
      .jaccardPairs(spark, hotDocs, dfCap = 10).count()
    assert(capped == 0)
  }

  test("MinHash bucket cap drops a mega-cluster but keeps normal near-dups") {
    import spark.implicits._
    // 300 exact dups: identical signatures put them all in ONE bucket per
    // band (> BucketCap) -> every band capped -> no pair expansion. The
    // small near-dup pair lives in a 2-member bucket and must survive.
    val base = (0 until 20).map(i => s"tok$i")
    val cluster = (0 until 300).map(i => (i.toLong, base.mkString(" ")))
      .map { case (id, _) => (id, "the same exact duplicated text repeated here verbatim") }
    val nearDup = Seq(
      (1000L, base.mkString(" ")),
      (1001L, (base.init :+ "changed").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketcap").toFile
    try {
      (cluster ++ nearDup).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val pairs = run2("q_dedup_minhash", dir.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!pairs.exists { case (a, b) => a < 300 && b < 300 },
        "capped mega-cluster must not produce quadratic pairs")
      assert(pairs.contains((1000L, 1001L)),
        "a small-bucket near-dup pair must survive the cap")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  def run2(name: String, dir: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("duplicate clusters are transitive: a chain A~B~C folds into one cluster") {
    import spark.implicits._
    import graft.queries.TextPipeline
    // A and C share nothing directly — only B links them. 30 tokens, each
    // neighbor differs in a disjoint 3-token patch, so adjacent jaccard
    // ~0.8+ while A vs C falls below the 0.8 edge threshold.
    val base = (0 until 30).map(j => s"w$j")
    def patched(at: Int, tag: String) =
      base.zipWithIndex.map { case (w, j) =>
        if (j >= at && j < at + 2) s"$tag$j" else w }.mkString(" ")
    val chain = Seq(
      (0L, patched(0, "a")),   // A: differs from B in tokens 0-1
      (1L, base.mkString(" ")),// B: the middle link
      (2L, patched(27, "c")))  // C: differs from B in tokens 27-28
    val lone = Seq((10L, (0 until 30).map(j => s"x$j").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft_cc").toFile
    try {
      (chain ++ lone).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // precondition: the A-C edge itself must be absent (below 0.8)
      val pairs = run2("q_neardup_jaccard", dir.toString).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)),
        s"chain edges missing: $pairs")
      assert(!pairs.contains((0L, 2L)), s"A~C edge should be sub-threshold: $pairs")
      val clusters = run2("q_dedup_clusters", dir.toString).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(Set(0L, 1L, 2L).forall(clusters(_)._1 == 0L),
        s"transitive closure failed: $clusters")
      assert(clusters(0L)._2 && !clusters(1L)._2 && !clusters(2L)._2,
        "keeper must be exactly the min id of the cluster")
      assert(clusters(10L) == (10L, true), "singleton labels itself")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("redactPii counts and redacts emails, IPs and phones exactly") {
    import spark.implicits._
    import graft.queries.TextPipeline
    val rows = Seq(
      (1L, "mail a.b-c_d%x+1@sub.example.co.uk then ip 10.2.3.4 call 555-123-4567 done"),
      (2L, "two mails x@y.io and z@w.ai one partial 999-12-3456 no match"),
      (3L, "no pii here at all"),
      (4L, "edge 255.255.255.255 1.2.3.4 and 555-000-0000"))
      .toDF("doc_id", "text")
    val out = TextPipeline.redactPii(rows).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def counts(id: Long) = {
      val r = out(id)
      (r.getAs[Long]("n_email"), r.getAs[Long]("n_ipv4"),
        r.getAs[Long]("n_phone"), r.getAs[Long]("pii_total"))
    }
    def red(id: Long) = out(id).getAs[String]("text_redacted")
    assert(counts(1L) == ((1L, 1L, 1L, 3L)))
    assert(red(1L) == "mail <EMAIL> then ip <IP> call <PHONE> done")
    assert(counts(2L) == ((2L, 0L, 0L, 2L)))
    assert(red(2L) == "two mails <EMAIL> and <EMAIL> one partial 999-12-3456 no match")
    assert(counts(3L) == ((0L, 0L, 0L, 0L)))
    assert(red(3L) == "no pii here at all")
    assert(counts(4L) == ((0L, 2L, 1L, 3L)))
    assert(red(4L) == "edge <IP> <IP> and <PHONE>")
  }

  test("trainOrder is a deterministic sharded permutation with no global sort") {
    import spark.implicits._
    import graft.queries.TextPipeline
    val n = 1000L
    val ids = (0L until n).toDF("doc_id")
    def key(rows: Array[org.apache.spark.sql.Row]): Map[Long, (Long, Long)] =
      rows.map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    val o1 = key(TextPipeline.trainOrder(ids).collect())
    // every id exactly once
    assert(o1.keySet == (0L until n).toSet)
    // shard in range; pos contiguous 1..count within each shard
    assert(o1.values.forall { case (s, _) => s >= 0 && s < TextPipeline.OrderShards })
    o1.values.groupBy(_._1).foreach { case (s, grp) =>
      val ps = grp.map(_._2).toSeq.sorted
      assert(ps == (1L to ps.size), s"shard $s positions not contiguous")
    }
    // deterministic across invocations; a different epoch seed reshuffles
    assert(key(TextPipeline.trainOrder(ids).collect()) == o1)
    val o2 = key(TextPipeline.trainOrder(ids, seed = "epoch2").collect())
    assert(o2 != o1, "different seed must give a different permutation")
    // plan shape: the one exchange hashes on shard; nothing range-partitions
    // (a global sort would be the 100 TB scale-killer this op avoids)
    val plan = TextPipeline.trainOrder(ids).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("curriculumOrder tiers by difficulty, shuffles within tier, no global sort") {
    import spark.implicits._
    import graft.queries.TextPipeline
    val n = 1000L
    // difficulty spans several 500-wide tiers plus the capped tail
    val docs = (0L until n).map(i => (i, i * 7 % 5000)).toDF("doc_id", "n_chars")
    def key(rows: Array[org.apache.spark.sql.Row]): Map[Long, (Long, Long, Long)] =
      rows.map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("bucket"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    val o1 = key(TextPipeline.curriculumOrder(docs).collect())
    assert(o1.keySet == (0L until n).toSet)
    // bucket is the capped integer tier of the difficulty column
    val diff = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    o1.foreach { case (id, (b, s, _)) =>
      assert(b == math.min(diff(id) / TextPipeline.CurriculumBucketWidth,
        TextPipeline.CurriculumMaxBucket), s"doc $id bucket $b")
      assert(s >= 0 && s < TextPipeline.OrderShards)
    }
    // pos contiguous 1..count within every (bucket, shard)
    o1.values.groupBy(v => (v._1, v._2)).foreach { case (bs, grp) =>
      val ps = grp.map(_._3).toSeq.sorted
      assert(ps == (1L to ps.size), s"tier $bs positions not contiguous")
    }
    // deterministic; a different seed reshuffles WITHIN tiers but cannot
    // move a doc across tiers (difficulty is seed-independent)
    assert(key(TextPipeline.curriculumOrder(docs).collect()) == o1)
    val o2 = key(TextPipeline.curriculumOrder(docs, seed = "epoch2").collect())
    assert(o2 != o1, "different seed must give a different within-tier order")
    assert(o1.forall { case (id, (b, _, _)) => o2(id)._1 == b },
      "seed change must not move docs across difficulty tiers")
    // plan shape: one hash exchange on (bucket, shard); nothing global
    val plan = TextPipeline.curriculumOrder(docs).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(bucket"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("vocab top-k matches brute force and actually cuts the vocabulary") {
    import graft.queries.TextPipeline
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val toks = docs.flatMap { case (id, t) => t.split(" ").map(id -> _) }
    val brute = toks.groupBy(_._2).map { case (tok, xs) =>
      (tok, xs.length.toLong, xs.map(_._1).distinct.length.toLong)
    }.toSeq.sortBy { case (tok, tf, _) => (-tf, tok) }
    assert(brute.size > TextPipeline.VocabTopK,
      "corpus vocabulary must exceed K or the cut is vacuous")
    val expect = brute.take(TextPipeline.VocabTopK).zipWithIndex
      .map { case ((tok, tf, df), i) => (i + 1L, tok, tf, df) }
    val got = run("q_vocab_topk").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("tok"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"))).toSeq
    assert(got == expect)
  }

  test("embedding LSH near-dup pairs are a high-cosine subset of brute force") {
    val brute = run("q_neardup_cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = run("q_neardup_lsh").collect()
    assert(lsh.nonEmpty)
    // LSH pairs carry the same cosine values as the brute-force formula
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(math.abs(c - r.getDouble(2)) < 1e-9))
    }
  }

  test("distributed BPE trainer matches a single-node Sennrich reference") {
    import graft.queries.TextPipeline
    // independent in-memory reimplementation of Sennrich et al. 2016
    // Algorithm 1 over the collected corpus (word-frequency table, greedy
    // non-overlapping merge apply), same tie-break (count desc, lhs, rhs)
    val words = scala.collection.mutable.Map.empty[List[String], Long]
    spark.read.parquet(s"$sf/documents.parquet").select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.matches("^[a-z]+$"))
      .foreach { w =>
        val k = w.map(_.toString).toList
        words(k) = words.getOrElse(k, 0L) + 1L
      }
    def applyMerge(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = syms
      while (rest.nonEmpty) {
        rest match {
          case a :: b :: t if a == l && b == r => out += (l + r); rest = t
          case a :: t                          => out += a; rest = t
          case Nil                             =>
        }
      }
      out.toList
    }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (step <- 1 to TextPipeline.BpeMerges) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        syms.zip(syms.tail).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + cnt)
      }
      val ((bl, br), tot) = pairs.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.head
      expect += ((step.toLong, bl, br, tot))
      val merged = words.toSeq.map { case (syms, cnt) =>
        applyMerge(syms, bl, br) -> cnt
      }
      words.clear()
      merged.foreach { case (k, c) => words(k) = words.getOrElse(k, 0L) + c }
    }
    val got = run("q_bpe_train").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("total"))).toSeq
      .sortBy(_._1)
    assert(got == expect.toSeq)
    // iterativeness: at least one learned rule consumes an earlier merge's
    // output symbol (multi-char lhs or rhs), i.e. this is not just a
    // one-shot bigram count
    assert(got.exists(m => m._2.length > 1 || m._3.length > 1))
  }

  test("BPE encode matches a single-node apply of the learned rules") {
    import graft.queries.TextPipeline
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    // reference rules via the distributed trainer (itself pinned against
    // the independent Sennrich loop in the previous test)
    val rules = TextPipeline.bpeTrainRules(
      spark.read.parquet(s"$sf/documents.parquet"))
      .map { case (_, l, r, _) => (l, r) }
    def applyMerge(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = syms
      while (rest.nonEmpty) {
        rest match {
          case a :: b :: t if a == l && b == r => out += (l + r); rest = t
          case a :: t                          => out += a; rest = t
          case Nil                             =>
        }
      }
      out.toList
    }
    val pieces = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(_.split(" ")).filter(_.nonEmpty).foreach { w =>
      val segs = rules.foldLeft(w.map(_.toString).toList) {
        case (s, (l, r)) => applyMerge(s, l, r)
      }
      segs.foreach(p => pieces(p) = pieces.getOrElse(p, 0L) + 1L)
    }
    val expect = pieces.toSeq.sortBy { case (p, n) => (-n, p) }
    val got = run("q_bpe_encode").collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("n"))).toSeq
    assert(got == expect)
    // the encode genuinely merges: multi-char pieces exist, and unseen
    // symbols (the trainer's [a-z]+ filter excluded them) pass through
    // character-level rather than vanishing
    assert(got.exists(_._1.length > 1))
    val corpusChars = texts.flatMap(_.split(" ")).flatten.toSet
    val nonAlpha = corpusChars.filterNot(c => c >= 'a' && c <= 'z')
    nonAlpha.foreach { c =>
      assert(got.exists(_._1.contains(c.toString)),
        s"non-alpha symbol '$c' missing from the encoded pieces")
    }
  }

  test("bigram LM score matches integer-exact brute force") {
    val docRows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bc = scala.collection.mutable.Map.empty[(String, String), Long]
    docRows.foreach { case (_, t) =>
      t.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1L)
      t.zip(t.tail).foreach(p => bc(p) = bc.getOrElse(p, 0L) + 1L)
    }
    val v = uni.size.toLong
    val expect = docRows.filter(_._2.length >= 2).map { case (id, t) =>
      val terms = t.zip(t.tail).map { case (w1, w2) =>
        ((bc((w1, w2)) + 1L) * 1000000L) / (uni(w1) + v)
      }
      (id, terms.length.toLong, terms.sum)
    }.sortBy(_._1).toSeq
    val got = run("q_lm_score").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("nb"),
        r.getAs[Long]("q"))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
    // the signal discriminates: per-doc mean transition scores differ
    assert(got.map(t => t._3 / t._2).distinct.length > 1)
  }

  test("BM25 matches integer-exact brute force and ranks the rare term first") {
    import graft.queries.TextPipeline
    val docRows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docRows.length.toLong
    val totTok = docRows.map(_._2.length.toLong).sum
    val avgdl1000 = 1000L * totTok / n
    val terms = TextPipeline.Bm25Terms
    val dfm = terms.map(t => t -> docRows.count(_._2.contains(t)).toLong).toMap
    val expect = docRows.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      val score = terms.map { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0L) 0L
        else {
          val idfQ = (2L * n - 2L * dfm(t) + 1L) * 1000L / (2L * dfm(t) + 1L)
          val tfnQ = (44L * tf * avgdl1000 * 1000L) /
            (20L * avgdl1000 * tf + 6L * avgdl1000 + 18000L * dl)
          idfQ * tfnQ
        }
      }.sum
      if (score > 0L) Some((id, score)) else None
    }.sortBy { case (id, s) => (-s, id) }.take(20).toSeq
    val got = run("q_bm25").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_q"))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
    // the rare term dominates: every doc containing it outranks every doc
    // that only matched the common terms (idf gap >> tf saturation range)
    val rare = terms.minBy(dfm)
    val withRare = docRows.filter(_._2.contains(rare)).map(_._1).toSet
    if (withRare.nonEmpty) {
      val gotIds = got.map(_._1)
      val lastRare = gotIds.lastIndexWhere(withRare.contains)
      val firstCommon = gotIds.indexWhere(!withRare.contains(_))
      assert(firstCommon == -1 || lastRare < firstCommon ||
        withRare.size > 20,
        s"rare-term docs should lead the ranking: $gotIds")
    }
  }

  test("BM25 range guards: pass implies every intermediate fits int64; pathological shapes refuse loudly") {
    import graft.queries.TextPipeline.{bm25IdfQ, bm25RangeGuards}
    val max = BigInt(Long.MaxValue)
    // sweep the guard boundary: shapes a 100 TB corpus could plausibly
    // reach (N to 1e12 docs, avgdl to 1e6 tokens, outlier docs to 1e8
    // tokens). For every combination the guards ACCEPT, verify by BigInt
    // that the worst-case per-row evaluation (tf = dl = maxDl, rarest
    // df = 1) never leaves int64 at any intermediate.
    val ns = Seq(1L, 1000L, 10_000_000L, 10_000_000_000L, 1_000_000_000_000L)
    val avgs = Seq(1000L, 100_000L, 1_000_000_000L) // avgdl1000 = 1000*avgdl
    val maxDls = Seq(10L, 100_000L, 100_000_000L)
    for (n <- ns; avgdl1000 <- avgs; maxDl <- maxDls) {
      val dfs = Seq(1L, math.max(1L, n / 2), n)
      val accepted =
        try { bm25RangeGuards(n, avgdl1000, maxDl, dfs); true }
        catch { case _: IllegalArgumentException => false }
      if (accepted) {
        val tf = maxDl; val dl = maxDl
        val satNum = BigInt(44L) * tf * avgdl1000 * 1000L
        val satDen = BigInt(20L) * avgdl1000 * tf + BigInt(6L) * avgdl1000 +
          BigInt(18000L) * dl
        assert(satNum <= max && satDen <= max, s"sat at n=$n avg=$avgdl1000")
        val satQ = satNum / satDen
        assert(satQ <= 2200, "saturation quotient ceiling")
        dfs.foreach { df =>
          val idfQ = BigInt(bm25IdfQ(n, df))
          assert((BigInt(2L) * n - 2L * df + 1L) * 1000L <= max)
          assert(idfQ * satQ <= max, s"term product at n=$n df=$df")
          assert(idfQ * satQ * dfs.length <= max, "summed score")
        }
      }
    }
    // the advisor's concrete failure shapes now refuse instead of wrapping:
    // ~6M+ docs was the OLD 1e6-quantization overflow point — now fine
    bm25RangeGuards(10_000_000L, 1000_000L, 100_000L, Seq(1L, 5L, 100L))
    // a doc with tf*avgdl past ~2e11 overflows the saturation numerator
    intercept[IllegalArgumentException] {
      bm25RangeGuards(1000L, 1_000_000_000L, 1_000_000_000L, Seq(1L))
    }
    // absurd N overflows the guarded idf leg
    intercept[IllegalArgumentException] {
      bm25RangeGuards(Long.MaxValue / 1000L, 1000L, 10L, Seq(1L))
    }
  }

  test("TF-IDF per-doc top terms match brute force with deterministic ties") {
    import graft.queries.TextPipeline
    val docRows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docRows.length.toLong
    val df = scala.collection.mutable.Map.empty[String, Long]
    docRows.foreach { case (_, t) =>
      t.distinct.foreach(w => df(w) = df.getOrElse(w, 0L) + 1L)
    }
    val expect = docRows.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (w, g) =>
        (w, g.length.toLong * (n * 1000L / df(w)))
      }.toSeq
        .sortBy { case (w, wq) => (-wq, w) }.take(TextPipeline.TfidfTopN)
        .zipWithIndex.map { case ((w, wq), i) => (id, i + 1L, w, wq) }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = run("q_tfidf_terms").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rnk"),
        r.getAs[String]("tok"), r.getAs[Long]("w_q"))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("weighted sample: independent md5 parity, and weight drives inclusion odds") {
    import graft.queries.TextPipeline
    import spark.implicits._
    // two weight classes over 2000 ids: 1000 heavy (w=1000) vs 1000 light
    // (w=1) — a 100-draw must be dominated by the heavy class (each heavy
    // key is ~1000x smaller in expectation)
    val df = (1L to 2000L).map(i => (i, if (i <= 1000) 1000L else 1L))
      .toDF("doc_id", "w")
    val got = TextPipeline.weightedSample(df, "w", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 100)
    val heavy = got.count(_._1 <= 1000)
    assert(heavy >= 95, s"heavy class should dominate the draw, got $heavy/100")
    // independent brute force: same md5 -> first-15-hex -> div-weight keys
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = (1L to 2000L).map { i =>
      val h = md.digest(s"wsamp$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val w = if (i <= 1000) 1000L else 1L
      (i, w, java.lang.Long.parseLong(h.take(15), 16) / w)
    }.sortBy { case (id, _, k) => (k, id) }.take(100)
    assert(got.toSeq == expect.toSeq)
  }

  test("cross-corpus near-dup screen flags edited and exact bench copies, not unrelated docs") {
    import graft.queries.TextPipeline
    import spark.implicits._
    val words = ('a' to 'z').map(_.toString)
    val base = words.take(20).mkString(" ")              // 20 tokens, 18 shingles
    val edited = (words.take(19) :+ "zz").mkString(" ")  // last token changed
    val ex = Seq((100L, base), (101L, words.reverse.take(20).mkString(" ")))
      .toDF("doc_id", "text")
    val in = Seq(
      (1L, edited),                        // near-dup of 100: j = 17/19
      (2L, words.map(w => w + w).take(20).mkString(" ")), // unrelated
      (3L, base)                           // exact copy of 100
    ).toDF("doc_id", "text")
    val got = TextPipeline.crossCorpusNearDups(spark, in, ex)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 3L), s"flagged: ${got.toSeq}")
    assert(got.forall(_._2 == 100L))
    assert(got.find(_._1 == 1L).get._3 ==
      math.floor(17.0 / 19.0 * 10000 + 0.5) / 10000)
    assert(got.find(_._1 == 3L).get._3 == 1.0)
  }

  test("stratified sample: exact per-stratum counts, md5-draw parity, group-limit plan") {
    import graft.queries.TextPipeline
    import spark.implicits._
    val df = (1L to 900L).map(i => (i, s"L${i % 3}")).toDF("doc_id", "lang")
    val n = 10
    val got = TextPipeline.stratifiedSample(df, "lang", n)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly n per stratum, positions 1..n
    got.groupBy(_._1).foreach { case (lang, g) =>
      assert(g.length == n, s"$lang: ${g.length}")
      assert(g.map(_._2).sorted.toSeq == (1L to n).toSeq)
    }
    // independent brute force of the seeded draw
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = (1L to 900L).map { i =>
      val h = md.digest(s"strat$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (s"L${i % 3}", h, i)
    }.groupBy(_._1).toSeq.flatMap { case (lang, g) =>
      g.sortBy(t => (t._2, t._3)).take(n).zipWithIndex
        .map { case ((_, _, id), p) => (lang, p + 1L, id) }
    }.sortBy(t => (t._1, t._2))
    assert(got.sortBy(t => (t._1, t._2)).toSeq == expect)
    // the pre-shuffle group limit fires: only <= n rows per stratum per
    // map task reach the exchange (the q_source_cap 100 TB shape)
    val plan = TextPipeline.stratifiedSample(df, "lang", n)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("chunked fuzzy decon flags an edited benchmark doc quoted inside a " +
      "long page that whole-doc fuzzy misses") {
    import spark.implicits._
    // bench doc 0 (0 % 7 == 0): a 40-token "eval question". Incoming page
    // 1: 96 filler tokens, then the quote with ONE token edited, then more
    // filler — placed at a chunk-stride offset so one 64-token window
    // captures it whole. Whole-doc jaccard ~ 0.12 (blind); the capturing
    // chunk's jaccard ~ 35/65 ~ 0.54 (flagged).
    val quote = (0 until 40).map(i => s"q$i")
    val edited = quote.dropRight(1) :+ "EDITED"
    val page = ((0 until 96).map(i => s"f$i") ++ edited ++
      (0 until 160).map(i => s"g$i")).mkString(" ")
    val d = Seq((0L, quote.mkString(" ")), (1L, page),
      (8L, (0 until 50).map(i => s"z$i").mkString(" "))) // another incoming, unrelated
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("chunk_decon").toString
    d.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val whole = SparkEntry.queries("q_decontaminate_fuzzy")(spark, dir).collect()
    assert(whole.isEmpty,
      s"whole-doc fuzzy should be structurally blind here: ${whole.toSeq}")
    val chunked = SparkEntry.queries("q_decontaminate_chunked")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(chunked.map(c => (c._1, c._2)).toSeq == Seq((1L, 0L)),
      s"chunked screen must flag page 1 against bench 0: ${chunked.toSeq}")
    assert(chunked.head._3 >= 0.5 && chunked.head._3 < 0.7, chunked.head._3)
  }

  test("containment flags a doc embedded in a larger one that jaccard misses") {
    import graft.queries.TextPipeline
    import spark.implicits._
    val words = (0 until 400).map(i => s"w$i")
    val small = words.take(30).mkString(" ")    // 28 shingles
    val big = words.mkString(" ")               // 398 shingles, contains small's
    val other = (0 until 100).map(i => s"z$i").mkString(" ")
    val d = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    val pairs = TextPipeline.jaccardPairs(spark, d, dfCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(6))).toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    val (_, _, common, aN, bN, jac) = pairs.head
    assert(common == 28 && aN == 28 && bN == 398)
    assert(jac < 0.1, s"symmetric jaccard must miss this pair: $jac")
    // the containment verdict flags it at 1.0 — same plan, extra projection
    val cont = pairs.head._3.toDouble / math.min(aN, bN)
    assert(cont == 1.0)
  }

  test("stratified sample strict: a stratum short of n refuses loudly; " +
      "full strata pass unchanged") {
    import graft.queries.TextPipeline
    import spark.implicits._
    // L0 has 300 rows, L9 has only 4 — an "up to n" draw under-represents
    // it silently; strict must refuse at execution instead
    val df = ((1L to 300L).map(i => (i, "L0")) ++
      (1000L to 1003L).map(i => (i, "L9"))).toDF("doc_id", "lang")
    val strictOk = TextPipeline.stratifiedSample(df, "lang", 4, strict = true)
      .collect()
    assert(strictOk.length == 8, "n=4 fits both strata: strict must pass")
    val e = intercept[Exception] {
      TextPipeline.stratifiedSample(df, "lang", 10, strict = true).collect()
    }
    assert(e.getMessage.contains("L9") && e.getMessage.contains("4"),
      s"error must name the short stratum and its size: ${e.getMessage}")
    // non-strict keeps the documented "up to n" contract
    val lax = TextPipeline.stratifiedSample(df, "lang", 10)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(lax.count(_._1 == "L0") == 10 && lax.count(_._1 == "L9") == 4)
  }

  test("PRF expansion: deterministic, weights bounded, expansion widens or reorders recall") {
    import graft.queries.TextPipeline
    val run2 = (1 to 2).map { _ =>
      run("q_prf_expand").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_q"))).toSeq
    }
    assert(run2(0) == run2(1), "PRF must be a pure function of the corpus")
    val got = run2(0)
    assert(got.nonEmpty && got.length <= 20)
    assert(got.forall(_._2 > 0))
    // ordered (score desc, doc_id asc)
    val key = got.map(t => (-t._2, t._1))
    assert(key == key.sorted)
    // the expanded query must actually differ from the plain BM25 ranking
    // in membership or order (expansion terms carry weight by construction)
    val plain = run("q_bm25").collect()
      .map(r => r.getAs[Long]("doc_id")).toSeq
    assert(got.map(_._1) != plain, "expansion changed nothing — suspicious")
  }

  test("snippet extraction: earliest max-hit window, rendered text, bm25 top docs") {
    import graft.queries.TextPipeline
    val win = TextPipeline.SnippetWin
    val terms = TextPipeline.Bm25Terms.toSet
    val got = run("q_snippet").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start"),
        r.getAs[Long]("n_hits"), r.getAs[String]("snippet"))).toSeq
    // snippets cover exactly the bm25 top-SnippetDocs docs
    val bmTop = run("q_bm25").collect().map(_.getAs[Long]("doc_id"))
      .take(TextPipeline.SnippetDocs).toSet
    assert(got.map(_._1).toSet == bmTop)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    got.foreach { case (id, start, hits, snippet) =>
      val t = toks(id)
      val starts = 1 to math.max(t.length - win + 1, 1)
      val hc = starts.map(s0 => t.slice(s0 - 1, s0 - 1 + win).count(terms))
      val best = hc.max
      assert(hits == best, s"doc $id: hits $hits != $best")
      assert(start == hc.indexOf(best) + 1, s"doc $id: not the earliest argmax")
      assert(snippet == t.slice(start.toInt - 1, start.toInt - 1 + win).mkString(" "))
      assert(hits >= 1, "a bm25 top doc must contain a query term")
    }
  }

  test("weighted sample refuses zero, negative, and null weights loudly") {
    import graft.queries.TextPipeline
    import spark.implicits._
    // a 0 weight used to produce a null skey (non-ANSI div) that sorted
    // FIRST and silently headed the sample — now it must throw
    for (bad <- Seq(0L, -5L)) {
      val df = Seq((1L, 10L), (2L, bad), (3L, 7L)).toDF("doc_id", "w")
      val e = intercept[Exception] {
        TextPipeline.weightedSample(df, "w", 2).collect()
      }
      assert(e.getMessage.contains("must be > 0"), s"weight=$bad: $e")
    }
    val withNull = Seq((1L, Some(10L)), (2L, None), (3L, Some(7L)))
      .toDF("doc_id", "w")
    val e = intercept[Exception] {
      TextPipeline.weightedSample(withNull, "w", 2).collect()
    }
    assert(e.getMessage.contains("must be > 0"), e.getMessage)
  }
}
