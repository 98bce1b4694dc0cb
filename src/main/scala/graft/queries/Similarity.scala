package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps._

/** Vector-search operator surface: brute-force top-k, IVF coarse
  * assignment/pruned search (the reference's core query path,
  * SURVEY.md §2.4 J3 / §2.5 A5-A10 / §3.1), and MaxSim late-interaction
  * scoring. Deterministic variants here use data-derived "centroids"
  * (embeddings vec_id < 8) so a DuckDB oracle can verify them exactly;
  * the trained-KMeans engine path lives in graft.index.
  *
  * Scale notes: the query/centroid side is always tiny => broadcast; the
  * only shuffle is the argmax/groupBy on vec_id which uses partial
  * aggregation (max of struct) — no window, no driver collect.
  */
object Similarity {
  import QueryDef._

  /** argmax-by-score with deterministic tie-break (lowest centroid id),
    * as a partial-aggregable max-of-struct. */
  private def argmaxCentroid(df: DataFrame): DataFrame =
    df.groupBy(col("vec_id"))
      .agg(max(struct(col("score").as("s"), (-col("centroid")).as("negc"))).as("m"))
      .select(col("vec_id"), (-col("m.negc")).cast("long").as("centroid"))

  /** assignment of every embedding to its nearest (max inner product)
    * centroid among the given (centroid, cemb) frame — broadcast argmax,
    * the only shuffle is the partial-aggregable max-of-struct. */
  private[graft] def argmaxAssign(e: DataFrame, c: DataFrame): DataFrame =
    argmaxCentroid(
      e.crossJoin(broadcast(c))
        .select(col("vec_id"), col("centroid"), dot(col("emb"), col("cemb")).as("score")))

  /** assignment of every embedding to its nearest (max inner product)
    * centroid, centroids = embeddings with vec_id < 8. */
  private def ivfAssign(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.emb(s, dir)
    argmaxAssign(e, e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid"), col("emb").as("cemb")))
  }

  /** IVF-clustered embedding near-dup pairs, parameterized by the centroid
    * set: assign -> pair-scan WITHIN clusters -> exact cosine filter. The
    * candidate volume is sum(cluster_size^2)/2, never n^2 — and the scale
    * knob is the CENTROID COUNT: holding per-cluster size ~constant (K
    * proportional to n) keeps total candidate work linear in n, which is
    * what ScaleSpec/ProfMain measure. q_neardup_ivf below pins K=8
    * data-derived centroids so DuckDB can verify the whole pipeline. */
  private[graft] def neardupIvfPairs(e: DataFrame, cents: DataFrame,
      minCos: Double): DataFrame = {
    val assign = argmaxAssign(e, cents)
    val withVec = assign.join(e.select(col("vec_id"), col("emb")), Seq("vec_id"))
    withVec.as("a").join(withVec.as("b"),
        col("a.centroid") === col("b.centroid") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(cosine(col("a.emb"), col("b.emb")), 4).as("cos"))
      .filter(col("cos") >= minCos)
  }

  private def queryVec(s: SparkSession, dir: String): DataFrame =
    Tables.emb(s, dir).filter(col("vec_id") === 0).select(col("emb").as("qe"))

  /** Per-leg depth of the hybrid fusion's rank cut. Declared BEFORE defs:
    * the oracle SQL strings interpolate it eagerly at object init. */
  private[graft] val HybridLegN = 50

  /** MMR re-ranking: candidate-pool depth, picks, and lambda=0.7 as the
    * integer pair (7, 3) — mmr = 7*rel - 3*maxsim in the x10 domain.
    * Declared before defs (oracle strings interpolate eagerly). */
  private[graft] val MmrPoolN = 50
  private[graft] val MmrK = 10

  /** Preset deterministic PCA model for the hash-checked projection twin
    * (q_pca_project_oracle) — the PQ/SQ8 "dyadic preset" discipline applied
    * to PCA. Every model value is exactly representable in binary floating
    * point, so both engines compute bit-identical doubles given the same
    * left-assoc evaluation order:
    *  - components: rows 1..8 of the 64x64 Sylvester Hadamard matrix
    *    (H[i][j] = (-1)^popcount(i AND j)) scaled by 1/8 = 0.125 — an exact
    *    dyadic orthonormal basis (row norm = sqrt(64)/8 = 1), the same
    *    family of structured rotations OPQ/LSH pipelines use;
    *  - mean: dyadic multiples of 1/8 in [-0.5, 0.375];
    *  - eigenvalues: 4^-(k mod 3), whose whitening scale 1/sqrt = 2^(k mod 3)
    *    is an exact power of two, so the whitened coefficients stay dyadic
    *    ({±0.125, ±0.25, ±0.5}) and every coefficient multiply is EXACT
    *    (power-of-two scaling never rounds). The only rounding ops are the
    *    per-dim centering subtraction and the running sum — identical IEEE
    *    ops in identical order on both engines. */
  private[graft] val PcaDim = 64
  private[graft] val PcaK = 8
  private def hadamardSign(i: Int, j: Int): Int =
    if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1 else -1
  private def pcaPresetMean(j: Int): Double = ((j % 8) - 4) / 8.0
  private def pcaPresetScale(k: Int): Int = 1 << (k % 3)
  private[graft] def pcaPresetModel: graft.functions.Pca.PcaModel =
    graft.functions.Pca.PcaModel(
      mean = Array.tabulate(PcaDim)(pcaPresetMean),
      components = Array.tabulate(PcaK, PcaDim)((k, j) =>
        hadamardSign(k + 1, j) * 0.125),
      eigenvalues = Array.tabulate(PcaK)(k => math.pow(4.0, -(k % 3))))

  /** DuckDB oracle for q_pca_project_oracle: the whitened projection
    * re-derived term-by-term. Each component k is a literal 64-term sum
    * `c_kj * (e[j] - m_j)` in ascending-j left-assoc order — the exact
    * operation sequence [[graft.functions.Pca.PcaModel.project]]'s inner
    * loop performs — quantized with the floorRound discipline
    * (floor(x*1e6 + 0.5), deterministic for identical input doubles,
    * unlike round()'s engine-split half handling). */
  private def pcaOracle: String = {
    val comps = (0 until PcaK).map { k =>
      val terms = (0 until PcaDim).map { j =>
        val c = hadamardSign(k + 1, j) * 0.125 * pcaPresetScale(k)
        val m = pcaPresetMean(j)
        s"($c * (e[${j + 1}] - ($m)))"
      }.mkString(" + ")
      s"CAST(floor(($terms) * 1000000 + 0.5) AS BIGINT) AS pc${k}_q"
    }.mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
      |SELECT vec_id,
      |  $comps
      |FROM e ORDER BY vec_id""".stripMargin
  }

  /** DuckDB oracle for q_mmr_rerank: the greedy selection unrolled into
    * one CTE pair per step (the q_bpe_train discipline — a sequential
    * algorithm is still hash-checkable if each step is SQL). */
  private def mmrOracle: String = {
    val cos = (a: String, b: String) =>
      s"CAST(floor(round(list_inner_product($a, $b) / " +
        s"(sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))" +
        s", 4) * 10000 + 0.5) AS BIGINT)"
    // every step CTE is MATERIALIZED: p_n references sel_{n-1} twice and
    // sel_n a third time, so inlined CTEs would expand the plan ~3^k-fold
    // and the optimizer never returns — materialization makes each of the
    // k steps one tiny (<= pool-row) scan
    val steps = (2 to MmrK).map { n =>
      s"""p$n AS MATERIALIZED (SELECT c.id AS id FROM cand c
        |  WHERE c.id NOT IN (SELECT id FROM sel${n - 1})
        |  ORDER BY 7 * c.rel - 3 * coalesce((SELECT max(s.s) FROM sim s
        |    WHERE s.a = c.id AND s.b IN (SELECT id FROM sel${n - 1})), 0)
        |    DESC, c.id LIMIT 1),
        |sel$n AS MATERIALIZED (SELECT * FROM sel${n - 1}
        |  UNION ALL SELECT id, CAST($n AS BIGINT) AS rnk FROM p$n)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
      |cosq AS (SELECT vec_id AS id, emb, ${cos("emb", "qe")} AS rel
      |  FROM e, q WHERE vec_id <> 0),
      |cand AS MATERIALIZED (SELECT id, emb, rel FROM cosq
      |  ORDER BY rel DESC, id LIMIT $MmrPoolN),
      |sim AS MATERIALIZED (SELECT a.id AS a, b.id AS b,
      |  ${cos("a.emb", "b.emb")} AS s
      |  FROM cand a JOIN cand b ON a.id <> b.id),
      |p1 AS (SELECT id FROM cand ORDER BY rel DESC, id LIMIT 1),
      |sel1 AS MATERIALIZED (SELECT id, CAST(1 AS BIGINT) AS rnk FROM p1),
      |$steps
      |SELECT rnk, id AS doc_id FROM sel$MmrK ORDER BY rnk""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    // A8/F2 — brute-force exact inner-product top-k (the rerank kernel and
    // the ANN correctness baseline).
    sql("q_dot_topk", Seq("A8", "F2", "T3"),
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(list_inner_product(embedding::DOUBLE[], qe), 4) AS score
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin) {
      (s, dir) =>
        Tables.emb(s, dir).filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(queryVec(s, dir)))
          .select(col("vec_id"), round(dot(col("emb"), col("qe")), 4).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(20)
    },

    // F1/F2 — cosine top-k (same formula on both sides: dot/(||a||*||b||)).
    sql("q_cosine_topk", Seq("F1", "F2"),
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_inner_product(embedding::DOUBLE[], qe) /
        |    (sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
        |     sqrt(list_inner_product(qe, qe))), 4) AS score
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin) {
      (s, dir) =>
        Tables.emb(s, dir).filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(queryVec(s, dir)))
          .select(col("vec_id"), round(cosine(col("emb"), col("qe")), 4).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(20)
    },

    // Q2/S4 — IVF coarse assignment: broadcast centroids + per-row argmax
    // inner product (reference: lintdb/quantizers/CoarseQuantizer.cpp:108-121,
    // lintdb/schema/DocProcessor.cpp:183-198).
    sql("q_ivf_assign", Seq("Q2", "S4"),
      """SELECT vec_id, centroid FROM (
        |  SELECT e.vec_id, c.vec_id AS centroid,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_inner_product(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |               c.vec_id) AS rn
        |  FROM embeddings e, embeddings c WHERE c.vec_id < 8)
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin) {
      (s, dir) => ivfAssign(s, dir).orderBy("vec_id")
    },

    // J3 + two-phase — full IVF search: probe the top-2 centroids for the
    // query, union their posting lists (partition pruning at scale), exact
    // rerank, top-10 (reference: lintdb/query/QueryNode.cpp:29-101,
    // QueryExecutor.cpp:14-71).
    sql("q_ivf_search", Seq("J3", "A9", "A10", "T1", "T2", "T3"),
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        |cents AS (SELECT vec_id AS centroid, embedding::DOUBLE[] AS cemb
        |          FROM embeddings WHERE vec_id < 8),
        |probe AS (SELECT centroid FROM cents, q
        |          ORDER BY list_inner_product(cemb, qe) DESC, centroid LIMIT 2),
        |assign AS (SELECT vec_id, centroid FROM (
        |  SELECT e.vec_id, c.centroid,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_inner_product(e.embedding::DOUBLE[], c.cemb) DESC, c.centroid) AS rn
        |  FROM embeddings e, cents c) WHERE rn = 1),
        |cand AS (SELECT vec_id FROM assign JOIN probe USING (centroid))
        |SELECT e.vec_id, round(list_inner_product(e.embedding::DOUBLE[], q.qe), 4) AS score
        |FROM embeddings e JOIN cand USING (vec_id), q
        |WHERE e.vec_id <> 0
        |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin) {
      (s, dir) =>
        val e = Tables.emb(s, dir)
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("centroid"), col("emb").as("cemb"))
        val probe = cents.crossJoin(broadcast(queryVec(s, dir)))
          .select(col("centroid"), dot(col("cemb"), col("qe")).as("cs"))
          .orderBy(col("cs").desc, col("centroid"))
          .limit(2)
          .select("centroid")
        val cand = ivfAssign(s, dir).join(broadcast(probe), "centroid").select("vec_id")
        e.join(cand, "vec_id")
          .filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(queryVec(s, dir)))
          .select(col("vec_id"), round(dot(col("emb"), col("qe")), 4).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(10)
    },

    // A5/A8 — MaxSim late-interaction scoring: docs = label groups (their
    // member vectors are the "tokens"), query = 4 tokens; per (doc, qtoken)
    // max inner product, then sum over qtokens (reference:
    // lintdb/scoring/plaid.cpp:65-95 and 119-185).
    sql("q_maxsim", Seq("A5", "A6", "A8"),
      """SELECT label, round(sum(m), 4) AS maxsim FROM (
        |  SELECT e.label, q.vec_id AS qid,
        |    max(list_inner_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])) AS m
        |  FROM embeddings e, embeddings q WHERE q.vec_id < 4
        |  GROUP BY 1, 2)
        |GROUP BY label ORDER BY maxsim DESC, label""".stripMargin) {
      (s, dir) =>
        val e = Tables.emb(s, dir)
        val q = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("qid"), col("emb").as("qe"))
        e.crossJoin(broadcast(q))
          .groupBy(col("label"), col("qid"))
          .agg(max(dot(col("emb"), col("qe"))).as("m"))
          .groupBy(col("label"))
          .agg(round(sum(col("m")), 4).as("maxsim"))
          .orderBy(col("maxsim").desc, col("label"))
    },

    // A7/A10 — centroid pruning: per-centroid max over query tokens, then
    // top-n_probe (reference: lintdb/scoring/plaid.cpp:98-117,
    // KnnNearestCentroids.cpp:38-110).
    sql("q_centroid_topk", Seq("A7", "A10", "T4", "T5"),
      """SELECT centroid, round(maxscore, 4) AS maxscore FROM (
        |  SELECT c.vec_id AS centroid,
        |    max(list_inner_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[])) AS maxscore
        |  FROM embeddings c, embeddings q WHERE c.vec_id < 8 AND q.vec_id < 4
        |  GROUP BY 1)
        |ORDER BY maxscore DESC, centroid LIMIT 4""".stripMargin) {
      (s, dir) =>
        val e = Tables.emb(s, dir)
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("centroid"), col("emb").as("cemb"))
        val q = e.filter(col("vec_id") < 4).select(col("emb").as("qe"))
        cents.crossJoin(broadcast(q))
          .groupBy(col("centroid"))
          .agg(max(dot(col("cemb"), col("qe"))).as("ms"))
          .select(col("centroid"), round(col("ms"), 4).as("maxscore"))
          .orderBy(col("maxscore").desc, col("centroid"))
          .limit(4)
    },

    // D5-scale (IVF variant) — near-dup pairs generated ONLY within coarse
    // clusters: assign every embedding to its nearest centroid, pair-scan
    // inside each cluster (key-partitioned self-join — candidate volume is
    // sum of cluster sizes squared, never n^2), exact cosine on survivors.
    // The standard at-scale embedding-dedup shape alongside the LSH twin
    // (q_neardup_lsh); centroids are data-derived (vec_id < 8) so the WHOLE
    // pipeline is oracle-checkable in DuckDB.
    sql("q_neardup_ivf", Seq("D5", "Q2"),
      """WITH cents AS (SELECT vec_id AS centroid, embedding::DOUBLE[] AS cemb
        |               FROM embeddings WHERE vec_id < 8),
        |assign AS (SELECT vec_id, centroid FROM (
        |  SELECT e.vec_id, c.centroid,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_inner_product(e.embedding::DOUBLE[], c.cemb) DESC, c.centroid) AS rn
        |  FROM embeddings e, cents c) WHERE rn = 1),
        |p AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id,
        |        round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |          (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |           sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos
        |      FROM assign x JOIN assign y ON x.centroid = y.centroid AND x.vec_id < y.vec_id
        |      JOIN embeddings a ON a.vec_id = x.vec_id
        |      JOIN embeddings b ON b.vec_id = y.vec_id)
        |SELECT a_id, b_id, cos FROM p WHERE cos >= 0.2
        |ORDER BY cos DESC, a_id, b_id""".stripMargin) {
      (s, dir) =>
        val e = Tables.emb(s, dir)
        neardupIvfPairs(e,
          e.filter(col("vec_id") < 8)
            .select(col("vec_id").as("centroid"), col("emb").as("cemb")),
          minCos = 0.2)
          .orderBy(col("cos").desc, col("a_id"), col("b_id"))
    },

    // Embedding-cosine near-duplicate pairs — brute-force upper-triangle
    // baseline (oracle-checkable); the LSH-bucketed scale path is
    // q_neardup_lsh in TextPipeline (rows-only).
    sql("q_neardup_cosine", Seq("D5"),
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |    (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |     sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY cos DESC, a_id, b_id LIMIT 20""".stripMargin) {
      (s, dir) =>
        // Distributed blocked all-pairs: rows are hashed into B blocks, each
        // row is replicated to the B block-pairs it participates in (a
        // broadcast join against a B(B+1)/2-row mapping — no driver collect),
        // and each block-pair is one task running a tight primitive loop with
        // a local top-20 heap. Only heap survivors hit the global
        // TakeOrdered. Shuffle volume is O(n*B) rows against O(n^2) compute,
        // the standard blocked pair-scan trade; per-task memory is two
        // blocks (2n/B rows). At 100 TB you'd raise B as n/blockRows — and
        // use the LSH twin (q_neardup_lsh) anyway; this brute scan is its
        // exact-answer baseline. Arithmetic parity with the oracle:
        // sequential left-to-right f64 accumulation (same as the DotProduct
        // expression) and Spark round() = BigDecimal HALF_UP — but rounding
        // runs only for pairs within one 1e-4 quantum of the heap floor
        // (round is monotone: raw < floor - 1e-4 implies round(raw) < floor,
        // so the skip is exact, not approximate).
        import s.implicits._
        def dotD(a: Array[Double], b: Array[Double]): Double = {
          var acc = 0.0; var i = 0
          while (i < a.length) { acc += a(i) * b(i); i += 1 }
          acc
        }
        def round4(x: Double): Double =
          // Spark's round() passes NaN/Infinity through; BigDecimal.valueOf
          // would throw on them (possible when a zero vector makes na*nb=0)
          if (x.isNaN || x.isInfinite) x
          else java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP)
            .doubleValue()
        val B = 8
        val numPairs = B * (B + 1) / 2
        // pid enumerates pairs (i,j), i<=j; a row in block b joins every pair
        // that contains b (exactly B of them), so each unordered row pair
        // meets in exactly one task.
        val mapping = (for { i <- 0 until B; j <- i until B; b <- Set(i, j) }
          yield (b, i * B - i * (i - 1) / 2 + (j - i))).toDF("blk", "pid")
        // worst-first ordering so the heap head is the eviction candidate
        val worstFirst = Ordering.by[(Double, Long, Long), (Double, Long, Long)] {
          case (c, a, b) => (-c, a, b)
        }
        Tables.emb(s, dir)
          .select(col("vec_id"), col("emb"),
            pmod(col("vec_id"), lit(B)).cast("int").as("blk"))
          .join(broadcast(mapping), "blk")
          .repartition(numPairs, col("pid"))
          .select(col("pid"), col("blk"), col("vec_id"), col("emb"))
          .as[(Int, Int, Long, Seq[Double])]
          .mapPartitions { it =>
            // bucket this partition's rows by pid (hash partitioning can map
            // several pids to one task), norms precomputed once per row
            val byPid = scala.collection.mutable.LinkedHashMap
              .empty[Int, scala.collection.mutable.ArrayBuffer[(Int, Long, Array[Double], Double)]]
            it.foreach { case (pid, blk, id, emb) =>
              val v = emb.toArray
              byPid.getOrElseUpdate(pid, scala.collection.mutable.ArrayBuffer.empty)
                .append((blk, id, v, math.sqrt(dotD(v, v))))
            }
            val heap = scala.collection.mutable.PriorityQueue.empty(worstFirst)
            var floor = Double.NegativeInfinity // head's rounded cos once full
            def offer(raw: Double, aId: Long, bId: Long): Unit =
              // NaN-safe: a NaN raw fails the < test and falls through to the
              // exact path, preserving the pre-guard behavior
              if (heap.size < 20 || !(raw < floor - 1e-4)) {
                val cand = (round4(raw), aId, bId)
                if (heap.size < 20) heap.enqueue(cand)
                else if (worstFirst.lt(cand, heap.head)) {
                  heap.dequeue(); heap.enqueue(cand)
                }
                if (heap.size == 20) floor = heap.head._1
              }
            byPid.foreach { case (pid, rows) =>
              val arr = rows.toArray
              var x = 0
              while (x < arr.length) {
                val (bx, ix, vx, nx) = arr(x)
                // same-block rows co-occur in every pid containing their
                // block; score them only in the diagonal pid (b,b) so each
                // unordered pair is scored exactly once. Cross-block pairs
                // exist in exactly one pid (the intersection of the two
                // rows' pid sets), so they always score.
                val diag = bx * B - bx * (bx - 1) / 2
                var y = x + 1
                while (y < arr.length) {
                  val (by, iy, vy, ny) = arr(y)
                  if (bx != by || pid == diag) {
                    val raw = dotD(vx, vy) / (nx * ny)
                    if (ix < iy) offer(raw, ix, iy) else offer(raw, iy, ix)
                  }
                  y += 1
                }
                x += 1
              }
            }
            heap.iterator
          }
          .toDF("cos", "a_id", "b_id")
          .select("a_id", "b_id", "cos")
          .orderBy(col("cos").desc, col("a_id"), col("b_id"))
          .limit(20)
    },

    // TA14 — PCA second moments, the oracle twin: count, per-dim sums and
    // upper-triangle sums of products over the embedding corpus, quantized
    // to exact integers (round(term * 1e6) summed as BIGINT) so the
    // cross-engine compare is order-independent and bit-exact — double
    // sums would hash-differ on association order alone. Row layout:
    // (0,0) = corpus count, (i,0) = sum of dim i, (i,j>=i) = sum of
    // products. This twin materializes the d(d+1)/2 terms per row to be
    // SQL-expressible; the production path is Pca.moments — one
    // mapPartitions pass with primitive accumulators, no explode, no
    // shuffle, driver state O(d^2) — and PcaSpec pins the two against
    // each other. Scale shape of the twin itself: the broadcast (i,j)
    // frame is metadata-sized and the product terms partial-aggregate
    // map-side, so the only shuffle carries <= d^2 groups.
    sql("q_embed_moments", Seq("TA14", "F2"),
      """WITH ij AS (
        |  SELECT i, j FROM range(1, 65) t(i), range(0, 65) u(j)
        |  WHERE j = 0 OR j >= i
        |  UNION ALL SELECT 0 AS i, 0 AS j),
        |terms AS (
        |  SELECT ij.i, ij.j,
        |    CASE WHEN ij.i = 0 THEN 1.0
        |         WHEN ij.j = 0 THEN e[ij.i]
        |         ELSE e[ij.i] * e[ij.j] END AS term
        |  FROM (SELECT embedding::DOUBLE[] AS e FROM embeddings), ij)
        |SELECT i, j, sum(round(term * 1000000)::BIGINT)::BIGINT AS q
        |FROM terms GROUP BY i, j ORDER BY i, j""".stripMargin) {
      (s, dir) =>
        import s.implicits._
        val d = 64
        val ijRows = (for {
          i <- 1 to d
          j <- 0 +: (i to d).toList
        } yield (i.toLong, j.toLong)) :+ (0L, 0L)
        val ij = broadcast(ijRows.toDF("i", "j"))
        Tables.emb(s, dir).select(col("emb")).crossJoin(ij)
          .select(col("i"), col("j"),
            when(col("i") === 0, lit(1.0))
              .when(col("j") === 0, element_at(col("emb"), col("i").cast("int")))
              .otherwise(element_at(col("emb"), col("i").cast("int")) *
                element_at(col("emb"), col("j").cast("int"))).as("term"))
          .groupBy(col("i"), col("j"))
          .agg(sum(round(col("term") * lit(1000000)).cast("long")).cast("long").as("q"))
          .orderBy("i", "j")
    },

    // TA14 — PCA projection: fit top-8 components (Pca.moments one-pass +
    // driver Jacobi on the 64x64 covariance, sign-canonical deterministic
    // basis) and project every embedding — a broadcast k x d matrix and k
    // dot products per row, no shuffle. Eigendecomposition is not
    // SQL-expressible, so this is a rows-only entry; PcaSpec carries the
    // semantics (orthonormal basis, AV = VΛ, per-component projected
    // variance = eigenvalue, moments parity with the oracle twin above).
    rowsOnly("q_pca_project", Seq("TA14", "Q1")) { (s, dir) =>
      val e = Tables.emb(s, dir)
      val model = graft.functions.Pca.fit(e, "emb", dim = 64, k = 8)
      model.project(e, "emb", "pc")
        .select(col("vec_id") +:
          (0 until 8).map(k =>
            round(element_at(col("pc"), k + 1), 4).as(s"pc$k")): _*)
        .orderBy("vec_id")
    },

    // TA14/Q1 — PCA projection under a PRESET deterministic model, the
    // hash-checked twin of q_pca_project above: the trained path's one
    // unverifiable stage is the Jacobi eigensolve, so this entry skips
    // training and drives the SAME production compose — PcaModel.whiten()
    // (per-component 1/sqrt(eigenvalue) scaling) then PcaModel.project()
    // (broadcast k x d matrix, k dot products per row, no shuffle) — with
    // the dyadic scaled-Hadamard model of [[pcaPresetModel]], whose every
    // coefficient multiply is exact in IEEE binary. DuckDB re-derives the
    // whitened projection term-by-term in the identical ascending-j
    // left-assoc order, so center -> project -> whiten -> quantize goes
    // under the hash. PcaSpec continues to pin the trained path
    // (orthonormality, AV=VΛ, projected variance == eigenvalue, moments
    // parity with q_embed_moments).
    sql("q_pca_project_oracle", Seq("TA14", "Q1"), pcaOracle) { (s, dir) =>
      val proj = pcaPresetModel.whiten()
        .project(Tables.emb(s, dir), "emb", "pc")
      proj.select(col("vec_id") +:
        (0 until PcaK).map(k =>
          floor(element_at(col("pc"), k + 1) * lit(1e6) + lit(0.5))
            .cast("long").as(s"pc${k}_q")): _*)
        .orderBy("vec_id")
    },

    // TA14/F2/T1 — hybrid retrieval via reciprocal-rank fusion (Cormack,
    // Clarke & Buettcher SIGIR'09: score = sum over legs of 1/(60+rank)):
    // the standard way a deployment combines the BM25 lexical leg with the
    // dense vector leg when their raw scores are incomparable. Both legs
    // reuse this library's own rankings — TextPipeline.bm25Scored for the
    // keyword leg (so lexical scoring can't drift between q_bm25 and the
    // fusion) and the q_cosine_topk formula for the vector leg — and the
    // fused score is integer-quantized (1e6 DIV (60+rank), exact int64 on
    // both engines) with a missing leg contributing 0 (its rank is beyond
    // the cut). Scale shape: each leg is a corpus-sized scan cut to LegN
    // rows by orderBy+limit (TakeOrderedAndProject — bounded partial
    // top-k per split, never a global sort); the rank windows and the
    // full-outer fusion join then run on two <= LegN-row frames, so the
    // single-partition WindowExec the plan shows touches 50 rows, not the
    // corpus, at any corpus size.
    sql("q_hybrid_rrf", Seq("TA14", "F2", "T1", "J2"),
      s"""WITH ${graft.queries.TextPipeline.bm25OracleCte},
        |kw AS (SELECT doc_id, r FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id) AS r
        |    FROM bm) WHERE r <= $HybridLegN),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
        |cos AS (SELECT vec_id, round(list_inner_product(emb, qe) /
        |      (sqrt(list_inner_product(emb, emb)) * sqrt(list_inner_product(qe, qe))), 4) AS c
        |    FROM e, q WHERE vec_id <> 0),
        |vec AS (SELECT doc_id, r FROM (
        |    SELECT vec_id AS doc_id, row_number() OVER (ORDER BY c DESC, vec_id) AS r
        |    FROM cos) WHERE r <= $HybridLegN)
        |SELECT coalesce(kw.doc_id, vec.doc_id) AS doc_id,
        |  coalesce(1000000 // (60 + kw.r), 0) +
        |  coalesce(1000000 // (60 + vec.r), 0) AS rrf_q
        |FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
        |ORDER BY rrf_q DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val kwRanked = graft.queries.TextPipeline.bm25Scored(s, dir)
        .orderBy(col("score_q").desc, col("doc_id")).limit(HybridLegN)
        .withColumn("r_kw", row_number().over(
          Window.orderBy(col("score_q").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("r_kw"))
      val vecRanked = Tables.emb(s, dir).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(queryVec(s, dir)))
        .select(col("vec_id"), round(cosine(col("emb"), col("qe")), 4).as("c"))
        .orderBy(col("c").desc, col("vec_id")).limit(HybridLegN)
        .withColumn("r_vec", row_number().over(
          Window.orderBy(col("c").desc, col("vec_id"))).cast("long"))
        .select(col("vec_id").as("doc_id"), col("r_vec"))
      kwRanked.join(vecRanked, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(expr("1000000 DIV (60 + r_kw)"), lit(0L)) +
            coalesce(expr("1000000 DIV (60 + r_vec)"), lit(0L))).as("rrf_q"))
        .orderBy(col("rrf_q").desc, col("doc_id")).limit(20)
    },

    // T2/F1 — MMR diversified re-ranking (Carbonell & Goldstein '98):
    // greedy top-[[MmrK]] selection maximizing lambda*relevance -
    // (1-lambda)*max-similarity-to-already-selected, lambda=0.7 — how a
    // training-data pipeline draws a DIVERSE sample from a similarity
    // neighborhood (dedup-aware retrieval, eval-set picking, few-shot
    // exemplar selection). All scoring in the quantized-int domain
    // (scores x10000, lambda as the pair 7/3 in the x10 domain) so the
    // greedy argmax — where a 1-ulp drift would cascade into a different
    // SELECTION, not just a different score — is bit-stable cross-engine.
    // Scale shape: the corpus-sized work is only the relevance leg's
    // TakeOrderedAndProject cut to [[MmrPoolN]]; the pool's pairwise sims
    // are a broadcast self-join producing pool^2 rows, and the inherently
    // sequential greedy loop runs driver-local over the collected <= pool
    // + pool^2 rows (the same bounded-collect class as the phase-2
    // rerank; pool=50 -> 2.5k rows). The oracle unrolls the 10 greedy
    // steps into CTE pairs (the q_bpe_train discipline).
    sql("q_mmr_rerank", Seq("T2", "F1", "F2"), mmrOracle) { (s, dir) =>
      val cand = Tables.emb(s, dir).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(queryVec(s, dir)))
        .select(col("vec_id").as("id"), col("emb"),
          floor(round(cosine(col("emb"), col("qe")), 4) * 10000 + 0.5)
            .cast("long").as("rel"))
        .orderBy(col("rel").desc, col("id")).limit(MmrPoolN)
      val c2 = cand.select(col("id").as("b_id"), col("emb").as("b_emb"))
      val sims = cand.select(col("id").as("a_id"), col("emb").as("a_emb"))
        .join(broadcast(c2), col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          floor(round(cosine(col("a_emb"), col("b_emb")), 4) * 10000 + 0.5)
            .cast("long").as("s"))
      val rels = cand.select(col("id"), col("rel")).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val simMap = sims.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val relMap = rels.toMap
      val selected = scala.collection.mutable.ArrayBuffer[Long]()
      val remaining = scala.collection.mutable.LinkedHashSet(rels.map(_._1): _*)
      while (selected.length < MmrK && remaining.nonEmpty) {
        // argmax of 7*rel - 3*maxsim, lowest id on ties — identical to the
        // oracle's ORDER BY ... DESC, c.id LIMIT 1
        val pick = remaining.toSeq.map { id =>
          val maxSim =
            if (selected.isEmpty) 0L
            else selected.map(sel => simMap.getOrElse((id, sel), 0L)).max
          (id, 7L * relMap(id) - 3L * maxSim)
        }.maxBy { case (id, sc) => (sc, -id) }._1
        selected += pick
        remaining -= pick
      }
      import s.implicits._
      selected.toSeq.zipWithIndex
        .map { case (id, i) => ((i + 1).toLong, id) }.toDF("rnk", "doc_id")
        .orderBy("rnk")
    }
  )
}
