package graft

import graft.core._
import graft.index.IndexIVF
import graft.query._
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("foreachBatch streaming ingest feeds the index incrementally") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(1)
    val corpus = (0L until 12L).map { i =>
      i -> Seq.fill(3)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toMap

    val path = java.nio.file.Files.createTempDirectory("idx_stream").toString
    val schema = GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 4, numIterations = 3)))
    val idx = IndexIVF.create(spark, path, schema)
    idx.train(corpus.toSeq.sortBy(_._1).map { case (i, t) => Doc(i, t, "x", 0L) }
      .toDF().select(col("id"), col("colbert")))

    // write the docs out as parquet files, stream them back in
    val srcDir = java.nio.file.Files.createTempDirectory("stream_src").toString
    corpus.toSeq.sortBy(_._1).map { case (i, t) => Doc(i, t, "x", 0L) }.toDF()
      .select(col("id"), col("colbert"))
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1) // several micro-batches
      .parquet(srcDir)

    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt").toString
    val q = StreamingIngest.start(idx, tenant = 1, stream, ckpt, Trigger.AvailableNow())
    q.awaitTermination(120000)

    // ingest completeness: every streamed doc has context + postings rows
    assert(idx.contextDf.select("doc_id").distinct().count() == 12)
    assert(idx.postingsDf.select("doc_id").distinct().count() == 12)
    // and the index is searchable (self-match; note centroids whose query
    // score is <= 0 are pruned, faithful to KnnNearestCentroids.cpp:71, so
    // full recall of all 12 docs is not guaranteed for a random query)
    val query = VectorQuery("colbert", corpus(5L).map(_.toArray).toArray)
    val got = idx.search(1, query, 12, SearchOptions(kTopCentroids = 4, nProbe = 4))
      .select("doc_id").collect().map(_.getLong(0))
    assert(got.contains(5L))

    // trickle hygiene: per-micro-batch appends fan out one file per touched
    // partition directory per batch; compactFiles (the maintenance op this
    // ingest mode exists for) merges them without changing results
    def fileCounts(tbl: String): Map[String, Int] = {
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(path, tbl))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(stream.iterator()).asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        .groupBy(_.getParent.toString).map { case (d, fs) => d -> fs.size }
      finally stream.close()
    }
    assert(fileCounts("postings").values.exists(_ > 1),
      "12 single-file micro-batches should have accumulated micro-files")
    // v5: context trickle lands one file per touched doc_bucket dir per
    // micro-batch — these 12 single-doc batches hit 12 DISTINCT buckets
    // (floorMod spread), so unlike postings no directory accumulates; the
    // layout bound to pin is one-file-per-dir before AND after compaction
    assert(fileCounts("context").size == 12,
      s"12 distinct-bucket docs should spread 12 context dirs: ${fileCounts("context")}")
    val resBefore = idx.search(1, query, 12, SearchOptions(kTopCentroids = 4, nProbe = 4))
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    idx.compactFiles()
    assert(fileCounts("postings").values.forall(_ == 1), s"${fileCounts("postings")}")
    assert(fileCounts("context").values.forall(_ == 1), s"${fileCounts("context")}")
    val resAfter = idx.search(1, query, 12, SearchOptions(kTopCentroids = 4, nProbe = 4))
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(resBefore == resAfter, "compactFiles changed streamed-index results")
  }

  test("streaming dedup drops cross-micro-batch duplicates") {
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    // duplicate the stream source: every event appears in two files
    val dir = java.nio.file.Files.createTempDirectory("ev_dup").toString
    events.write.mode("overwrite").parquet(s"$dir/a")
    events.write.mode("overwrite").parquet(s"$dir/b")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
    val deduped = graft.streaming.StreamingIngest
      .dedupedStream(stream, Seq("event_id"), "ts", "1 hour")
    val qn = s"stream_dedup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table(qn).count() == events.count(),
      "each duplicated event survives exactly once")
  }

  test("watermark path accepts a TIMESTAMP_NTZ-sourced stream once normalized") {
    // Reproduce the round-9 testdata generation exactly: parquet whose ts is
    // TIMESTAMP(MICROS) isAdjustedToUTC=false, which Spark 4 reads back as
    // TimestampNTZType — watermarks reject that type outright
    // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so streaming sources must route
    // through the same normalization the batch loaders use.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("ev_ntz").toString
    events.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("ts").dataType == TimestampNTZType,
      "fixture must round-trip as NTZ to exercise the failure mode")
    val stream = graft.queries.Tables.normalizeTs(
      spark.readStream.schema(back.schema).option("maxFilesPerTrigger", 1)
        .parquet(dir),
      "ts")
    assert(stream.schema("ts").dataType == TimestampType)
    val deduped = graft.streaming.StreamingIngest
      .dedupedStream(stream, Seq("event_id"), "ts", "1 hour")
    val qn = s"stream_ntz_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table(qn).count() == events.count())
  }

  test("streaming near-dup dedup collapses equal-signature docs") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    // every doc arrives twice across micro-batches
    val dir = java.nio.file.Files.createTempDirectory("neardup_stream").toString
    docs.write.mode("overwrite").parquet(s"$dir/a")
    docs.write.mode("overwrite").parquet(s"$dir/b")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
    val deduped = graft.streaming.StreamingIngest
      .nearDupDedupedStream(stream, "text", "ts", "1 hour")
    val qn = s"stream_neardup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // batch ground truth: one survivor per distinct signature
    val expected = docs
      .select(graft.functions.TextHash.simhash64(split(col("text"), " ")).as("sig"))
      .distinct().count()
    assert(spark.table(qn).count() == expected,
      "exactly one survivor per simhash signature")
    assert(expected < docs.count() * 2, "duplicated input actually collapsed")
  }

  test("streaming decontamination guard drops docs sharing an 8-gram with the benchmark") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    // benchmark = the q_decontaminate stand-in set (doc_id % 31), via the
    // SHARED kernel — the batch operator's own definition of contamination
    val bench = docs.filter(col("doc_id") % 31 === 0)
      .select(explode(graft.queries.TextPipeline.deconShingles(col("text"))).as("sh"))
    val dir = java.nio.file.Files.createTempDirectory("decon_stream").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val guarded = graft.streaming.StreamingIngest
      .decontaminatedStream(stream, "text", bench)
    val qn = s"stream_decon_${System.nanoTime()}"
    val q = guarded.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // batch ground truth: survivors = docs with no benchmark shingle (note
    // the benchmark docs themselves are self-contaminated and get dropped —
    // the INGEST guard must never admit benchmark text verbatim, unlike the
    // batch AUDIT which reports only non-benchmark docs)
    val benchSet = bench.distinct().collect().map(_.getString(0)).toSet
    val expected = docs.collect().count { r =>
      val t = r.getString(1).split(" ")
      !(t.length >= 8 && t.sliding(8).exists(w => benchSet.contains(w.mkString(" "))))
    }
    val got = spark.table(qn).count()
    assert(got == expected, s"guard admitted $got docs, batch ground truth $expected")
    assert(got < docs.count(), "at least the benchmark docs themselves were dropped")

    // graded threshold: at maxContamMils=999 only near-wholesale copies are
    // dropped — ground truth recomputed with the same per-mil rule
    val guarded2 = graft.streaming.StreamingIngest
      .decontaminatedStream(spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir), "text", bench,
        maxContamMils = 999)
    val qn2 = s"stream_decon2_${System.nanoTime()}"
    val q2 = guarded2.writeStream.outputMode("append")
      .format("memory").queryName(qn2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val expected2 = docs.collect().count { r =>
      val t = r.getString(1).split(" ")
      val shs = if (t.length >= 8) t.sliding(8).map(_.mkString(" ")).toSeq.distinct else Nil
      val hits = shs.count(benchSet.contains)
      !(shs.nonEmpty && hits.toLong * 1000 > 999L * shs.length)
    }
    val got2 = spark.table(qn2).count()
    assert(got2 == expected2,
      s"graded guard admitted $got2 docs, batch ground truth $expected2")
    assert(got2 >= got, "a looser threshold can only admit more docs")
  }

  test("streaming fuzzy decontamination matches the batch cross-corpus matcher") {
    import spark.implicits._
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val mod = graft.queries.TextPipeline.DeconFuzzyBenchMod
    val bench = docs.filter(col("doc_id") % mod === 0)
    // incoming = the non-bench corpus PLUS two synthetic light edits of
    // bench docs (guaranteed flags, so the equality below is never vacuous)
    val edits = bench.orderBy("doc_id").limit(2).collect().zipWithIndex.map {
      case (r, i) =>
        val t = r.getString(1).split(" ")
        (1000000L + i, (t.dropRight(1) :+ "zzedit").mkString(" "))
    }.toSeq.toDF("doc_id", "text")
    val incoming = docs.filter(col("doc_id") % mod =!= 0).union(edits)
    // ground truth from the PRODUCTION batch matcher itself
    val expected = graft.queries.TextPipeline
      .crossCorpusNearDups(spark, incoming, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.exists(_._1 >= 1000000L),
      "synthetic edits must be flagged or the equality check is vacuous")
    // exact equality below holds ONLY while no INCOMING band bucket is hot
    // (the batch matcher drops hot incoming buckets' band rows; the stream
    // keeps them — see the superset test). Check the precondition instead
    // of assuming the fixture stays that way.
    assert(maxIncomingBucket(incoming) <= graft.queries.TextPipeline.BucketCap,
      "fixture drifted: an incoming band bucket is hot, so batch/stream " +
        "verdicts may legitimately diverge — adjust the fixture")

    val dir = java.nio.file.Files.createTempDirectory("fuzzy_decon_stream").toString
    incoming.repartition(4).write.mode("overwrite").parquet(dir)
    def stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val qn = s"fuzzy_decon_${System.nanoTime()}"
    val q = StreamingIngest.fuzzyDeconMatches(stream, "text", bench)
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table(qn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"stream flags diverged from batch: only-stream=${got -- expected}, " +
        s"only-batch=${expected -- got}")

    // and the admitted stream is exactly the unflagged complement
    val qn2 = s"fuzzy_decon_clean_${System.nanoTime()}"
    val q2 = StreamingIngest.fuzzyDecontaminatedStream(stream, "text", bench)
      .writeStream.outputMode("append").format("memory").queryName(qn2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val admitted = spark.table(qn2).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val all = incoming.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == all -- expected.map(_._1),
      "admitted set must be the exact unflagged complement")
  }

  test("streaming CHUNKED fuzzy guard matches the batch chunked screen on " +
      "the spliced-quote fixture (and whole-doc fuzzy stays blind)") {
    import spark.implicits._
    // the TextPipelineSpec spliced-quote fixture: bench doc 0 is a
    // 40-token eval question; incoming page 1 quotes it with one token
    // edited inside 256 filler tokens; incoming doc 8 is unrelated
    val quote = (0 until 40).map(i => s"q$i")
    val edited = quote.dropRight(1) :+ "EDITED"
    val page = ((0 until 96).map(i => s"f$i") ++ edited ++
      (0 until 160).map(i => s"g$i")).mkString(" ")
    val d = Seq((0L, quote.mkString(" ")), (1L, page),
      (8L, (0 until 50).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("chunk_decon_stream").toString
    d.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // batch ground truth from the PRODUCTION chunked screen query
    val expected = SparkEntry.queries("q_decontaminate_chunked")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.map(t => (t._1, t._2)) == Set((1L, 0L)),
      s"fixture drifted: batch must flag page 1 against bench 0: $expected")

    val mod = graft.queries.TextPipeline.DeconFuzzyBenchMod
    val bench = d.filter(col("doc_id") % mod === 0)
    val incoming = d.filter(col("doc_id") % mod =!= 0)
    val srcDir = java.nio.file.Files.createTempDirectory("chunk_decon_src").toString
    incoming.repartition(2).write.mode("overwrite").parquet(srcDir)
    def stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)

    // the whole-doc streaming guard is blind here, like its batch twin
    val qnW = s"chunk_whole_${System.nanoTime()}"
    val qw = StreamingIngest.fuzzyDeconMatches(stream, "text", bench)
      .writeStream.outputMode("append").format("memory").queryName(qnW)
      .trigger(Trigger.AvailableNow()).start()
    qw.awaitTermination(120000)
    assert(spark.table(qnW).isEmpty,
      "whole-doc fuzzy guard should be structurally blind to the quote")

    // the chunked guard's flag set equals the batch chunked screen's
    val qn = s"chunk_fuzzy_${System.nanoTime()}"
    val q = StreamingIngest.chunkedFuzzyDeconMatches(stream, "text", bench)
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table(qn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"stream chunked flags diverged from batch: only-stream=${got -- expected}, " +
        s"only-batch=${expected -- got}")

    // admitted = the exact unflagged complement
    val qn2 = s"chunk_clean_${System.nanoTime()}"
    val q2 = StreamingIngest.chunkedFuzzyDecontaminatedStream(stream, "text", bench)
      .writeStream.outputMode("append").format("memory").queryName(qn2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val admitted = spark.table(qn2).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(admitted == Set(8L), s"admitted must be only the clean doc: $admitted")
  }

  /** Largest INCOMING-side band-bucket population under the production
    * minhash geometry — the quantity the batch matcher's incoming-side
    * hot-bucket cap compares against BucketCap. */
  private def maxIncomingBucket(incoming: org.apache.spark.sql.DataFrame): Long = {
    import graft.queries.TextPipeline
    val bands = TextPipeline.MinhashBands
    val rows = TextPipeline.MinhashRows
    TextPipeline.minhashSigs(TextPipeline.shingleArrays(incoming))
      .select(posexplode(array((0 until bands).map(i =>
        xxhash64((0 until rows).map(r => col(s"h${rows * i + r}")): _*)): _*))
        .as(Seq("band", "bucket")))
      .groupBy("band", "bucket").count()
      .agg(max("count")).collect()(0).getLong(0)
  }

  test("streaming fuzzy guard flags a SUPERSET of batch when an incoming " +
      "band bucket is hot (the documented divergence direction)") {
    import spark.implicits._
    // bench: a few multi-token docs; incoming: BucketCap+2 verbatim clones
    // of bench doc 0 (every clone lands in the same 8 band buckets -> all
    // hot on the incoming side) plus clean docs that match nothing
    val cap = graft.queries.TextPipeline.BucketCap
    val mkText = (seed: Int) => (0 until 12).map(j => s"w${seed}_$j").mkString(" ")
    val bench = (0L until 5L).map(i => (i, mkText(i.toInt))).toDF("doc_id", "text")
    val clones = (0 until cap + 2).map(i => (1000L + i, mkText(0)))
    val clean = (0 until 3).map(i => (5000L + i, mkText(100 + i)))
    val incoming = (clones ++ clean).toDF("doc_id", "text")
    assert(maxIncomingBucket(incoming) > cap,
      "fixture must actually make an incoming bucket hot")

    val batchFlags = graft.queries.TextPipeline
      .crossCorpusNearDups(spark, incoming, bench)
      .select("in_id").collect().map(_.getLong(0)).toSet
    // the batch matcher drops the hot incoming buckets' band rows, so the
    // clones lose their only candidates and are NOT flagged by batch
    assert(!batchFlags.exists(id => id >= 1000L && id < 5000L),
      s"expected batch to miss the hot-bucket clones, flagged: $batchFlags")

    val dir = java.nio.file.Files.createTempDirectory("fuzzy_hot_stream").toString
    incoming.repartition(2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val qn = s"fuzzy_hot_${System.nanoTime()}"
    val q = StreamingIngest.fuzzyDeconMatches(stream, "text", bench)
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamFlags = spark.table(qn).select("in_id").collect()
      .map(_.getLong(0)).toSet

    // superset: every batch verdict is also a stream verdict...
    assert(batchFlags.subsetOf(streamFlags),
      s"stream must flag at least what batch flags: missing=${batchFlags -- streamFlags}")
    // ...and the stream additionally catches every clone (jaccard 1.0 vs
    // bench doc 0), exactly the docs the batch cap dropped
    assert(clones.map(_._1).toSet.subsetOf(streamFlags),
      "stream must flag the hot-bucket clones the batch matcher dropped")
    // clean docs stay unflagged on both paths
    assert(!streamFlags.exists(_ >= 5000L), "clean docs must pass")
  }

  test("streaming CHUNKED guard flags a SUPERSET of the batch chunked " +
      "screen when an incoming CHUNK band bucket is hot, and the admitted " +
      "set is the exact unflagged complement") {
    import spark.implicits._
    import graft.queries.TextPipeline
    // bench doc 0 is a 64-token eval question (one full chunk window).
    // Incoming: BucketCap+2 pages, each quoting it VERBATIM at token offset
    // 48 inside DISTINCT filler — so chunk 1 of every page is the identical
    // quote (its band buckets go hot on the incoming CHUNK side) while the
    // whole-doc signatures all differ (no whole-doc bucket is hot). Plus
    // clean docs that match nothing.
    val cap = TextPipeline.BucketCap
    val stride = TextPipeline.ChunkStride // 48
    val win = TextPipeline.ChunkTokens // 64
    val quote = (0 until win).map(i => s"q$i")
    val mkPage = (seed: Int) =>
      ((0 until stride).map(i => s"f${seed}_$i") ++ quote ++
        (0 until 32).map(i => s"g${seed}_$i")).mkString(" ")
    val bench = Seq((0L, quote.mkString(" "))).toDF("doc_id", "text")
    val pages = (0 until cap + 2).map(i => (1000L + i, mkPage(i)))
    val clean = (0 until 3).map(i => (5000L + i, (0 until 70)
      .map(j => s"z${i}_$j").mkString(" ")))
    val incoming = (pages ++ clean).toDF("doc_id", "text")
    // precondition: a CHUNK band bucket is hot on the incoming side
    assert(maxIncomingBucket(
      TextPipeline.chunkedDocs(incoming, TextPipeline.ChunkIdScale)) > cap,
      "fixture must make an incoming chunk band bucket hot")

    // the batch chunked screen caps BOTH join sides, so the hot incoming
    // chunk bucket's band rows are dropped and the quoting pages lose their
    // only candidates — batch misses them all
    val batchFlags = TextPipeline.bestMatchPerParent(
      TextPipeline.crossCorpusNearDups(spark,
        TextPipeline.chunkedDocs(incoming, TextPipeline.ChunkIdScale),
        TextPipeline.chunkedDocs(bench, TextPipeline.ChunkIdScale)),
      TextPipeline.ChunkIdScale)
      .select("in_id").collect().map(_.getLong(0)).toSet
    assert(!batchFlags.exists(id => id >= 1000L && id < 5000L),
      s"expected batch to miss the hot-chunk-bucket pages, flagged: $batchFlags")

    val dir = java.nio.file.Files.createTempDirectory("chunk_hot_stream").toString
    incoming.repartition(2).write.mode("overwrite").parquet(dir)
    def stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val qn = s"chunk_hot_${System.nanoTime()}"
    val q = StreamingIngest.chunkedFuzzyDeconMatches(stream, "text", bench)
      .writeStream.outputMode("append").format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamFlags = spark.table(qn).select("in_id").collect()
      .map(_.getLong(0)).toSet

    // superset: every batch verdict is also a stream verdict, and the
    // stream additionally flags every quoting page (jaccard 1.0 on the
    // quote chunk) — exactly the docs the batch incoming-side cap dropped
    assert(batchFlags.subsetOf(streamFlags),
      s"stream must flag at least what batch flags: missing=${batchFlags -- streamFlags}")
    assert(pages.map(_._1).toSet.subsetOf(streamFlags),
      "stream must flag the hot-chunk-bucket pages the batch cap dropped")
    assert(!streamFlags.exists(_ >= 5000L), "clean docs must pass")

    // admitted = the exact unflagged complement of the stream's flag set
    val qn2 = s"chunk_hot_clean_${System.nanoTime()}"
    val q2 = StreamingIngest.chunkedFuzzyDecontaminatedStream(stream, "text", bench)
      .writeStream.outputMode("append").format("memory").queryName(qn2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val admitted = spark.table(qn2).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(admitted == (pages.map(_._1) ++ clean.map(_._1)).toSet -- streamFlags,
      s"admitted must be the exact unflagged complement: $admitted")
  }

  test("session windows run identically in batch and as a stream") {
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    // batch ground truth from the SAME function (watermark is a no-op there)
    val expected = StreamingIngest.sessionWindows(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val dir = java.nio.file.Files.createTempDirectory("ev_sess").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 4) // several micro-batches: sessions merge
      .parquet(dir)
    val agg = StreamingIngest.sessionWindows(stream)
    val qn = s"stream_sessions_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table(qn)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("session-window state is bounded by ACTIVE sessions across micro-batches, not history") {
    import spark.implicits._
    // 10 users x 3 widely-separated epochs = 30 sessions of history; the
    // files arrive in event-time order across >= 3 micro-batches (one file
    // per epoch, mod-time ordered). With a 1-minute watermark and
    // day-separated epochs, the watermark closes each previous epoch's
    // sessions as the next arrives, so the state store must only ever hold
    // the sessions the watermark has not passed — at most two epochs' worth
    // transiently (watermark lags one batch), NEVER the 30-session history.
    // This measures the stateful-op memory claim instead of asserting it.
    val users = 10
    val epochs = Seq("2026-01-01 00:00:00", "2026-01-02 00:00:00",
      "2026-01-03 00:00:00").map(java.sql.Timestamp.valueOf(_).getTime)
    def epochDf(base: Long) = (0 until users).flatMap { u =>
      (0 until 5).map(i => (u.toLong, base + i * 1000L))
    }.toDF("user_id", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
    val dir = java.nio.file.Files.createTempDirectory("sess_state").toString
    epochs.foreach { base =>
      epochDf(base).coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100) // mod-time order == event-time order, second-granular
    }
    val stream = spark.readStream.schema(epochDf(epochs.head).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val agg = StreamingIngest.sessionWindows(stream,
      gap = "1 minute", watermark = "1 minute")
    val qn = s"stream_sess_state_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stateBatches = q.recentProgress.toSeq.filter(_.stateOperators.nonEmpty)
    assert(stateBatches.size >= 3,
      s"expected >= 3 micro-batches with state, got ${stateBatches.size}")
    val totals = stateBatches.map(_.stateOperators.map(_.numRowsTotal).sum)
    assert(totals.max <= 2L * users,
      s"session state held ${totals.max} rows — more than the two-epoch " +
        s"active bound (${2 * users}); history is ${3 * users} sessions")
    // the watermark-closed sessions actually left state INTO the result
    // (append mode only emits closed sessions)
    assert(spark.table(qn).count() >= users.toLong,
      "closed sessions were not emitted downstream")
  }

  test("mapGroupsWithState per-user stats converge to the batch aggregate") {
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val expected = events
      .groupBy(col("user_id"))
      .agg(min(unix_millis(col("ts"))).as("first"), max(unix_millis(col("ts"))).as("last"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val dir = java.nio.file.Files.createTempDirectory("ev_stats").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 8) // several micro-batches: state carries over
      .parquet(dir)
    val stats = graft.streaming.StreamingIngest.userStats(stream)
    val qn = s"stream_stats_${System.nanoTime()}"
    val q = stats.toDF().writeStream.outputMode("update")
      .format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // update mode appends one row per (user, batch); the final state per
    // user is the row with the highest (monotonically growing) count
    val got = spark.table(qn).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).maxBy(_._3) }
    assert(got == expected)
  }

  test("per-source admission cap bounds every (source, window) across micro-batches") {
    import spark.implicits._
    // 3 sources with per-window volumes straddling the cap, one source
    // spanning two windows; the input is SPLIT across two files (not
    // duplicated — admission is not dedup) so the hot source's arrivals
    // cross a micro-batch boundary and the cap must hold via state
    val windowMs = 3600L * 1000
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime
    val rows = (0 until 5).map(i => (i.toLong, "tiny", base + i * 1000)) ++
      (0 until 80).map(i => (100L + i, "hot", base + i * 1000)) ++
      (0 until 30).map(i => (1000L + i, "spread",
        base + (i % 2) * windowMs + i * 1000))
    def toDocs(rs: Seq[(Long, String, Long)]) = rs.toDF("doc_id", "source", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
    val dir = java.nio.file.Files.createTempDirectory("srccap_stream").toString
    val (fstRows, sndRows) = rows.zipWithIndex.partition(_._2 % 2 == 0)
    toDocs(fstRows.map(_._1)).coalesce(1).write.mode("overwrite").parquet(s"$dir/a")
    toDocs(sndRows.map(_._1)).coalesce(1).write.mode("overwrite").parquet(s"$dir/b")
    val stream = spark.readStream.schema(toDocs(rows.take(1)).schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*")
    val cap = 50
    val capped = StreamingIngest.sourceCappedStream(
      stream, "ts", "source", "doc_id", cap, windowMs)
    val qn = s"stream_srccap_${System.nanoTime()}"
    val q = capped.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val admitted = spark.table(qn).as[graft.streaming.AdmittedDoc].collect()
    // ground truth: min(cap, per-(source,window) input volume) — duplicated
    // input does NOT double admission (the count is stateful)
    val expected = rows.groupBy { case (_, src, tms) =>
      (src, tms - java.lang.Math.floorMod(tms, windowMs))
    }.map { case (k, g) => k -> math.min(cap, g.size) }
    val got = admitted.groupBy(d => (d.source, d.window_start_ms))
      .map { case (k, g) => k -> g.length }
    assert(got == expected, s"admission counts: got $got, expected $expected")
    // every admitted doc is a real input doc in its own window
    val input = rows.map { case (id, src, tms) =>
      (id, src, tms - java.lang.Math.floorMod(tms, windowMs))
    }.toSet
    assert(admitted.forall(d => input((d.doc_id, d.source, d.window_start_ms))))
    // admitted ids are unique (cap admits each doc at most once)
    assert(admitted.map(_.doc_id).distinct.length == admitted.length)
  }

  test("windowed aggregation with watermark matches the batch plan") {
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    // batch ground truth
    val expected = events
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap

    // run the same aggregation as a file-source stream over a copy of events
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val agg = StreamingIngest.windowedCounts(stream)
    val qn = s"stream_counts_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table(qn)
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("PII scrub runs unchanged on a stream (stateless) and matches batch") {
    import spark.implicits._
    // PII-bearing docs split across micro-batches: the scrub is stateless
    // column work, so the SAME redactPii kernel must apply to a streaming
    // frame with no streaming-specific variant and produce the batch result
    val docs = Seq(
      (1L, "write me at a.user@example.org or at b.user@example.org today"),
      (2L, "server 192.168.1.17 peered with 10.0.0.254 over vpn"),
      (3L, "call 555-867-5309 before noon"),
      (4L, "clean row with nothing to scrub")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pii_stream").toString
    docs.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val scrubbed = graft.queries.TextPipeline.redactPii(stream)
    assert(scrubbed.isStreaming, "kernel must compose with a streaming frame")
    val qn = s"stream_pii_${System.nanoTime()}"
    val q = scrubbed.writeStream.outputMode("append")
      .format("memory").queryName(qn)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_email", "n_ipv4", "n_phone", "pii_total", "text_redacted")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    val got = key(spark.table(qn))
    assert(got == key(graft.queries.TextPipeline.redactPii(docs)))
    assert(got(1L)._1 == 2L && got(2L)._2 == 2L && got(3L)._3 == 1L && got(4L)._4 == 0L)
  }
}
