package graft

import graft.core._
import graft.index.IndexIVF
import graft.query._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval-quality bar, in the spirit of the reference's LoTTE Success@k
  * evaluation (benchmarks/lotte/common.py:275-305): index the embeddings
  * table as label-documents, query each label with a held-out subset of its
  * own vectors, and require the true label to rank in the top-k. Runs over
  * all quantizers so the lossy codecs are held to the same bar. */
class RetrievalQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  def buildIndex(quant: QuantizerKind.Value): (IndexIVF, Map[Long, Array[Array[Float]]]) = {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val docs = e.groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("toks"))
      .select(col("label").cast("long").as("id"),
        expr("transform(toks, t -> t.embedding)").as("colbert"))
    val idx = IndexIVF.create(spark,
      java.nio.file.Files.createTempDirectory(s"idx_quality_$quant").toString,
      GSchema(Seq(GField.colbert("colbert", 64, numCentroids = 16,
        quantization = quant, numIterations = 4, nbits = 2, numSubquantizers = 8))))
    idx.train(docs)
    idx.add(1, docs)
    // held-out query per label: that label's first 3 member vectors
    val queries = docs.collect().map { r =>
      r.getLong(0) -> r.getSeq[scala.collection.Seq[Float]](1)
        .take(3).map(_.toArray).toArray
    }.toMap
    (idx, queries)
  }

  for (quant <- Seq(QuantizerKind.NONE, QuantizerKind.BINARIZER,
    QuantizerKind.PRODUCT_ENCODER, QuantizerKind.SQ8))
    test(s"$quant: success@3 == 1.0 for label self-retrieval") {
      val (idx, queries) = buildIndex(quant)
      val opts = SearchOptions(kTopCentroids = 8, nProbe = 16)
      val hits = queries.toSeq.sortBy(_._1).map { case (label, q) =>
        val top = idx.search(1, VectorQuery("colbert", q), 3, opts)
          .select("doc_id").collect().map(_.getLong(0))
        if (top.contains(label)) 1 else 0
      }
      val successAt3 = hits.sum.toDouble / hits.size
      assert(successAt3 == 1.0, s"$quant success@3 = $successAt3")
    }

  // ------------------------------------------------------------------------
  // The harder bar, toward the reference's golden ColBERT ranking test
  // (tests/colbert_test.cpp:27-104 — its prebuilt RocksDB index + ranking
  // TSV can't be reproduced without LintDB itself, so the fixture is
  // synthetic but the CHECK is the same shape): a 10k-doc corpus where every
  // doc has 3 near-duplicate distractors (token noise sigma=0.05), queried
  // with 64 cluster leaders, graded Success@5 against driver-side
  // brute-force MaxSim ranking, per codec.
  //
  // Thresholds (documented): NONE must agree with brute force on every
  // query under exhaustive probing (1.0 — it is the same arithmetic);
  // BINARIZER (2-bit) >= 0.95 and PQ (8 subquantizers) >= 0.95 under
  // realistic nProbe=8/32 pruning, where codec loss must still keep the
  // true doc in the top 5 among its own near-duplicates. (The PQ bar was
  // 0.90 through round 10; round 11 measured the actual value at 1.0 —
  // both with the r10 encoder and the k-means++/balanced-perm one — so the
  // codecs now share the same bar. ProfMain pq_quality re-measures.)
  // ------------------------------------------------------------------------

  val ddim = 32
  val toksPerDoc = 4
  val nClusters = 2500
  val dupsPerCluster = 4 // leader + 3 near-dups => 10k docs
  val nQueries = 64

  /** corpus: cluster c's leader doc id = c * dupsPerCluster; near-dups are
    * the leader's tokens plus N(0, 0.05)-ish uniform noise. */
  lazy val bigCorpus: Map[Long, Array[Array[Float]]] = {
    val rnd = new scala.util.Random(1234)
    (0 until nClusters).flatMap { c =>
      val leader = Array.fill(toksPerDoc)(Array.fill(ddim)(rnd.nextFloat() * 2f - 1f))
      (0 until dupsPerCluster).map { d =>
        val toks =
          if (d == 0) leader
          else leader.map(_.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
        (c * dupsPerCluster + d).toLong -> toks
      }
    }.toMap
  }

  /** driver-side exact MaxSim (Plaid.scoreByResiduals normalize=true
    * semantics: doc tokens L2-normalized, per-query-token max clamped at 0),
    * -> top-1 doc per query. */
  lazy val bruteTop1: Map[Long, Long] = {
    val docs = bigCorpus.toArray.map { case (id, toks) =>
      val normed = toks.map { t =>
        val n = math.sqrt(t.map(x => x * x).sum).toFloat
        t.map(_ / n)
      }
      (id, normed)
    }
    (0 until nQueries).map { c =>
      val qid = (c * dupsPerCluster).toLong
      val q = bigCorpus(qid)
      var bestId = -1L
      var bestScore = Float.MinValue
      docs.foreach { case (id, toks) =>
        var total = 0f
        q.foreach { qt =>
          var best = 0f // 0-init like the reference's maxScores
          toks.foreach { t =>
            var s = 0f; var d = 0
            while (d < ddim) { s += qt(d) * t(d); d += 1 }
            if (s > best) best = s
          }
          total += best
        }
        if (total > bestScore || (total == bestScore && id < bestId)) {
          bestScore = total; bestId = id
        }
      }
      qid -> bestId
    }.toMap
  }

  def successAt5(quant: QuantizerKind.Value, opts: SearchOptions): Double = {
    import spark.implicits._
    val docs = bigCorpus.toSeq.sortBy(_._1)
      .map { case (id, toks) => (id, toks.map(_.toSeq).toSeq) }
      .toDF("id", "colbert")
    val idx = IndexIVF.create(spark,
      java.nio.file.Files.createTempDirectory(s"idx_hard_$quant").toString,
      GSchema(Seq(GField.colbert("colbert", ddim, numCentroids = 32,
        quantization = quant, numIterations = 4, nbits = 2, numSubquantizers = 8))))
    idx.train(docs)
    idx.add(1, docs)
    // ONE index pass for all 64 queries (the amortized deployment shape)
    val queries = (0 until nQueries)
      .map(c => ((c * dupsPerCluster).toLong,
        bigCorpus((c * dupsPerCluster).toLong).map(_.toSeq).toSeq))
      .toDF("query_id", "tokens")
    val top5 = graft.query.BatchSearcher.searchBatch(idx, 1, "colbert", queries, 5, opts)
      .select("query_id", "doc_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val hits = bruteTop1.count { case (qid, want) => top5.get(qid).exists(_.contains(want)) }
    hits.toDouble / nQueries
  }

  test("NONE: success@5 == 1.0 vs brute-force MaxSim under near-dup distractors") {
    val s = successAt5(QuantizerKind.NONE,
      SearchOptions(kTopCentroids = 32, nProbe = 32))
    assert(s == 1.0, s"identity codec success@5 = $s (must match brute force)")
  }

  test("BINARIZER: success@5 >= 0.95 under near-dup distractors (nProbe=8)") {
    val s = successAt5(QuantizerKind.BINARIZER,
      SearchOptions(kTopCentroids = 8, nProbe = 8))
    assert(s >= 0.95, s"binarizer success@5 = $s < 0.95")
  }

  test("PRODUCT_ENCODER: success@5 >= 0.95 under near-dup distractors (nProbe=8)") {
    val s = successAt5(QuantizerKind.PRODUCT_ENCODER,
      SearchOptions(kTopCentroids = 8, nProbe = 8))
    info(f"pq success@5 = $s%.4f")
    assert(s >= 0.95, s"pq success@5 = $s < 0.95")
  }

  test("SQ8: success@5 >= 0.95 under near-dup distractors (nProbe=8)") {
    // 8 bits/dim is near-lossless (max per-dim error = range/512), so the
    // scalar codec must clear the same bar as the 2-bit binarizer at 4x
    // the bytes of PQ — the middle point of the codec family
    val s = successAt5(QuantizerKind.SQ8,
      SearchOptions(kTopCentroids = 8, nProbe = 8))
    info(f"sq8 success@5 = $s%.4f")
    assert(s >= 0.95, s"sq8 success@5 = $s < 0.95")
  }
}
