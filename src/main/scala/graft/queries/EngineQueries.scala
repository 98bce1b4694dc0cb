package graft.queries

import graft.core._
import graft.index.IndexIVF
import graft.query._
import org.apache.spark.sql.functions._

/** Driver-visible end-to-end runs of the actual engine ([[IndexIVF]]):
  * create -> train (MLlib KMeans) -> add (posting/context build) -> search
  * (two-phase PLAID). Results depend on trained centroids, so there is no
  * SQL oracle — the driver records the rows-only check; determinism comes
  * from the fixed KMeans seed, and exactness-vs-brute-force is asserted in
  * IndexSpec.
  */
object EngineQueries {
  import QueryDef._

  /** JVM-local cache of trained coarse centroids per data dir: lets the
    * binarized variant reuse the NONE run's centroids (the
    * clone-from-trained flow, S3) instead of re-running KMeans. One small
    * entry per dir — no index/temp-dir retention. */
  private val trainedCentroids =
    scala.collection.concurrent.TrieMap[String, Map[String, graft.quantizers.CoarseQuantizer]]()

  /** JVM-local cache of collected query token vectors per data dir. */
  private val queryCache =
    scala.collection.concurrent.TrieMap[String, Array[Array[Float]]]()

  private def queryTokens(s: org.apache.spark.sql.SparkSession, dir: String,
      maxVecId: Int): Array[Array[Float]] =
    queryCache.getOrElseUpdate(s"$dir#$maxVecId",
      Tables.t(s, dir, "embeddings").filter(col("vec_id") < maxVecId)
        .orderBy("vec_id").collect()
        .map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray))

  /** docs = embeddings grouped by label (10 "documents" whose member
    * vectors are the tokens). */
  private def buildIndex(s: org.apache.spark.sql.SparkSession, dir: String,
      quant: QuantizerKind.Value): (IndexIVF, String) = {
    val e = Tables.t(s, dir, "embeddings")
    // the sibling engine query reuses the materialized docs aggregation
    // (a few hundred KB per dir); session-aware via DfCache
    val docs = DfCache.getOrBuild(s, s"engine_docs#$dir") {
      e.groupBy(col("label"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("toks"),
          count(lit(1)).as("n_vecs"))
        .select(col("label").cast("long").as("id"),
          expr("transform(toks, t -> t.embedding)").as("colbert"),
          col("n_vecs"))
    }
    val schema = GSchema(Seq(
      GField.colbert("colbert", dimensions = 64, numCentroids = 16,
        quantization = quant, numIterations = 4, nbits = 2),
      GField(name = "n_vecs", dataType = GDataType.INTEGER.toString,
        roles = Seq(FieldRole.Stored.toString))))
    val path = java.nio.file.Files.createTempDirectory(s"graft_engine_$quant").toString
    val idx = IndexIVF.create(s, path, schema)
    // reuse centroids from a sibling engine query's run on the same data
    trainedCentroids.get(dir).foreach(c => idx.coarse = c)
    idx.train(docs)
    idx.add(tenant = 1, docs)
    trainedCentroids.putIfAbsent(dir, idx.coarse)
    (idx, path)
  }

  /** query = vec_ids 0..3 as the 4 query tokens. */
  private def buildAndSearch(s: org.apache.spark.sql.SparkSession, dir: String,
      quant: QuantizerKind.Value) = withoutAqe(s) {
    val (idx, path) = buildIndex(s, dir, quant)
    val query = queryTokens(s, dir, maxVecId = 4)
    val result = idx.search(1, VectorQuery("colbert", query), k = 5,
      SearchOptions(kTopCentroids = 4, nProbe = 8))
    materializeAndClean(s, result, path)
  }

  /** The engine queries are the latency-shaped workload: a small
    * per-invocation index and an interactive search. AQE's per-stage runtime
    * replanning only adds driver latency on plans this size (it exists to
    * re-plan big shuffles on runtime stats), so it is toggled off around the
    * engine lifecycle and restored after — the data-scale pipelines keep it. */
  private def withoutAqe[A](s: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(key, "true")
    s.conf.set(key, "false")
    try body finally s.conf.set(key, prev)
  }

  /** The result is lazy over the index's parquet files: materialize (a few
    * rows), detach, and delete the temp index tree so repeated bench/verify
    * runs don't leak index directories under /tmp. */
  private def materializeAndClean(s: org.apache.spark.sql.SparkSession,
      result: org.apache.spark.sql.DataFrame, path: String) = {
    val rows = result.collect().toSeq
    val local = s.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, result.schema)
    deleteRecursively(java.nio.file.Paths.get(path))
    local
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (!Files.exists(root)) return
    val it = Files.walk(root).sorted(java.util.Comparator.reverseOrder[Path]())
    try it.forEach(p => Files.deleteIfExists(p)) finally it.close()
  }

  val defs: Seq[QueryDef] = Seq(
    // S1-S5 + J3/A5/A8/T1-T3 — the full reference query lifecycle
    // (SURVEY §3.1) through the engine, identity codec.
    rowsOnly("q_engine_search", Seq("S1", "S2", "S4", "S5", "J3", "A5", "A8")) {
      (s, dir) => buildAndSearch(s, dir, QuantizerKind.NONE)
    },
    // Same with the PLAID binarizer codec in the loop (Q4).
    rowsOnly("q_engine_search_binarized", Seq("Q4", "S4", "S5", "J3", "A5", "A8")) {
      (s, dir) => buildAndSearch(s, dir, QuantizerKind.BINARIZER)
    },
    // Batch search — the amortized deployment shape (SURVEY §7.5.4): ONE
    // pruned pass over the index serves all queries via a broadcast
    // (query_id, centroid) probe table; per-query top-k is one window
    // shuffle. Verify-only (not in the headline bench set).
    rowsOnly("q_engine_batch_search", Seq("BATCH", "J3", "A5", "A8")) { (s, dir) =>
      import s.implicits._
      withoutAqe(s) {
      val (idx, path) = buildIndex(s, dir, QuantizerKind.NONE)
      val queries = queryTokens(s, dir, maxVecId = 12)
        .map(_.toSeq)
        .grouped(4).zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.toSeq) }.toSeq
        .toDF("query_id", "tokens")
      val res = graft.query.BatchSearcher.searchBatch(idx, 1, "colbert", queries,
        k = 3, SearchOptions(kTopCentroids = 4, nProbe = 8))
      materializeAndClean(s, res, path)
      }
    },
    // Amortized-latency harness: 212 queries through ONE BatchSearcher pass
    // — the shape of the reference's LoTTE benchmark harness, which answers
    // 212 queries in-process (benchmarks/run_lintdb.py:36-95). A single
    // search() costs whole Spark jobs regardless of data size (SURVEY
    // §7.5.4), so per-query cost is only meaningful amortized over a batch;
    // the batch window logs ms/query for COVERAGE.md. Verify-only (excluded
    // from the pinned headline set).
    rowsOnly("q_engine_batch_search_212", Seq("BATCH", "J3", "A5", "A8")) { (s, dir) =>
      import s.implicits._
      withoutAqe(s) {
        val (idx, path) = buildIndex(s, dir, QuantizerKind.NONE)
        val pool = queryTokens(s, dir, maxVecId = 848)
        val n = pool.length
        val queries = (0 until 212).map { i =>
          (i.toLong, (0 until 4).map(j => pool((i * 4 + j) % n).toSeq))
        }.toDF("query_id", "tokens")
        val t0 = System.nanoTime()
        val res = graft.query.BatchSearcher.searchBatch(idx, 1, "colbert", queries,
          k = 3, SearchOptions(kTopCentroids = 4, nProbe = 8))
        val out = materializeAndClean(s, res, path)
        val ms = (System.nanoTime() - t0) / 1e6
        log.warn(f"q_engine_batch_search_212: ${ms / 212}%.1f ms/query amortized " +
          f"(212 queries, ${ms / 1000}%.2f s batch, index build excluded)")
        out
      }
    }
  )

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.EngineQueries")
}
