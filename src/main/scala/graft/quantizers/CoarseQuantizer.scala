package graft.quantizers

import graft.core.Json
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF coarse quantizer: a flat centroid matrix with inner-product argmax
  * assignment (reference: lintdb/quantizers/CoarseQuantizer.cpp:9-258 and
  * the Faiss-backed twin at :260-352 — both are exhaustive IP argmax over
  * the centroid matrix; only training differs).
  *
  * Training is Lloyd's on a bounded seeded subsample (see
  * [[CoarseQuantizer.train]]), Euclidean assignment. The reference trains
  * with METRIC_INNER_PRODUCT (lintdb/quantizers/impl/kmeans.cpp:25); on
  * L2-normalized embeddings argmax-IP == argmin-L2, so assignments agree —
  * but *scores* must still be computed as inner products
  * (CoarseQuantizer.cpp:108-110), which [[search]]/[[scoreAll]] do.
  */
final class CoarseQuantizer(val centroids: Array[Array[Float]]) extends Serializable {
  def numCentroids: Int = centroids.length
  def dim: Int = centroids.headOption.map(_.length).getOrElse(0)

  /** argmax inner product; deterministic tie-break = lowest centroid id.
    * Delegates to the block kernel so single-vector and batch assignment
    * share one canonical accumulation order (bit-identical results). */
  def assign(vec: Array[Float]): Int = assignBlock(vec, 1)(0)

  /** Transposed (dim-major) copy of the centroid matrix — row i holds dim i
    * of ALL centroids contiguously — built lazily once per JVM/executor
    * (transient: rebuilt after broadcast deserialization). This is the
    * layout that turns assignment into elementwise array FMAs HotSpot's
    * SuperWord pass actually vectorizes: per-centroid DOT products are
    * sequential FP reductions, which C2 refuses to SIMD (float addition
    * doesn't reassociate), while `scores(c) += tv * row(c)` is a pure
    * elementwise loop that packs into AVX lanes like a saxpy. */
  @transient private lazy val flatT: Array[Float] = {
    val d = dim
    val k = centroids.length
    val out = new Array[Float](k * d)
    var c = 0
    while (c < k) {
      val row = centroids(c)
      var i = 0
      while (i < d) { out(i * k + c) = row(i); i += 1 }
      c += 1
    }
    out
  }

  /** GEMM-shaped argmax assignment for a BLOCK of vectors (flattened
    * row-major (n x dim)) — the production shape for the O(n*K) assignment
    * term of train/add once K grows with the corpus (the reference leans on
    * Faiss' blocked knn_inner_product for exactly this,
    * CoarseQuantizer.cpp assign/train paths).
    *
    * Dispatch: the register-blocked SIMD kernel ([[AssignKernel]], JDK
    * incubator Vector API — 4 tokens per centroid-row load, accumulators
    * register-resident across the whole dim loop) when the module is
    * present, else a scalar fallback. BOTH compute the same canonical
    * result: a centroid's score accumulates dim-ascending with each product
    * rounded before its add — in the SIMD kernel every centroid owns one
    * LANE, so there is no cross-lane reduction and therefore no
    * reassociation at any vector width. Bit-identical across paths and to
    * single-vector [[assign]] (which delegates here); pinned by
    * CoarseQuantizerSpec. */
  def assignBlock(vecs: Array[Float], n: Int): Array[Int] = {
    val k = numCentroids
    val d = dim
    require(vecs.length == n * d, s"assignBlock: ${vecs.length} floats != $n x $d")
    val out = new Array[Int](n)
    if (n == 0 || k == 0) return out
    CoarseQuantizer.simdKernel match {
      case Some(m) =>
        m.invoke(null, vecs, Int.box(n), Int.box(d), flatT, Int.box(k), out)
      case None => assignBlockScalar(vecs, n, out)
    }
    out
  }

  /** Scalar twin of [[AssignKernel]] with the identical accumulation order
    * (dim-ascending elementwise sweeps over the dim-major matrix — the
    * SLP-vectorizable saxpy shape, so even the fallback beats the old
    * per-centroid dot loop). private[graft] so the parity spec can pin
    * SIMD == scalar regardless of which one assignBlock dispatched to. */
  private[graft] def assignBlockScalar(vecs: Array[Float], n: Int,
      out: Array[Int]): Unit = {
    val k = numCentroids
    val d = dim
    val ct = flatT
    val scores = new Array[Float](k)
    var t = 0
    while (t < n) {
      java.util.Arrays.fill(scores, 0f)
      val ao = t * d
      var i = 0
      while (i < d) {
        val tv = vecs(ao + i)
        val ro = i * k
        var c = 0
        while (c < k) { scores(c) += tv * ct(ro + c); c += 1 }
        i += 1
      }
      var best = 0
      var bs = Float.NegativeInfinity
      var c = 0
      while (c < k) { val s = scores(c); if (s > bs) { bs = s; best = c }; c += 1 }
      out(t) = best
      t += 1
    }
  }

  /** all centroid scores for one vector (inner products). */
  def scoreAll(vec: Array[Float]): Array[Float] = scoreBlock(vec, 1)

  /** Full (n x numCentroids) score matrix for a block of flattened
    * row-major vectors — the planning-side sibling of [[assignBlock]]
    * (Searcher.computePlan's matrix fill IS this shape; at production
    * scale, nc=65536 x nq=32 x dim sequential dots were the remaining
    * driver-side planning cost). Same dispatch and the same
    * lane-per-centroid accumulation order as assignment: bit-identical to
    * the per-centroid sequential dot at any vector width. */
  def scoreBlock(vecs: Array[Float], n: Int): Array[Float] = {
    val k = numCentroids
    val d = dim
    require(vecs.length == n * d, s"scoreBlock: ${vecs.length} floats != $n x $d")
    val out = new Array[Float](n * k)
    if (n == 0 || k == 0) return out
    CoarseQuantizer.simdScoreKernel match {
      case Some(m) =>
        m.invoke(null, vecs, Int.box(n), Int.box(d), flatT, Int.box(k), out)
      case None => scoreBlockScalar(vecs, n, out)
    }
    out
  }

  /** Scalar twin of [[AssignKernel.scoreBlock]] with the identical
    * accumulation order (see [[assignBlockScalar]]). */
  private[graft] def scoreBlockScalar(vecs: Array[Float], n: Int,
      out: Array[Float]): Unit = {
    val k = numCentroids
    val d = dim
    val ct = flatT
    var t = 0
    while (t < n) {
      val ao = t * d
      val oo = t * k
      var i = 0
      while (i < d) {
        val tv = vecs(ao + i)
        val ro = i * k
        var c = 0
        while (c < k) { out(oo + c) += tv * ct(ro + c); c += 1 }
        i += 1
      }
      t += 1
    }
  }

  /** top-k (centroid, score) by inner product, descending. */
  def search(vec: Array[Float], k: Int): Array[(Int, Float)] =
    scoreAll(vec).zipWithIndex.map { case (s, c) => (c, s) }
      .sortBy { case (c, s) => (-s, c) }.take(k)

  def residual(vec: Array[Float], centroid: Int): Array[Float] = {
    val c = centroids(centroid)
    val out = new Array[Float](vec.length)
    var i = 0
    while (i < vec.length) { out(i) = vec(i) - c(i); i += 1 }
    out
  }

  def save(path: String): Unit =
    Json.write(path, Map("centroids" -> centroids.map(_.toSeq).toSeq))
}

object CoarseQuantizer {

  /** The SIMD kernel's entry point, resolved ONCE by reflection — and only
    * after probing the incubator module's own class, so `AssignKernel`
    * (which links against jdk.incubator.vector) is never even loaded when
    * the module is absent and the bit-identical scalar twin takes over.
    * Reflection also keeps the Scala compile unit free of any reference to
    * the incubator API (scalac has no --add-modules). Per-invoke overhead
    * is one boxed call per BLOCK (a whole document's tokens) — noise next
    * to the kernel's own runtime. */
  private[quantizers] lazy val simdKernel: Option[java.lang.reflect.Method] =
    try {
      Class.forName("jdk.incubator.vector.FloatVector")
      Some(Class.forName("graft.quantizers.AssignKernel").getMethod("assignBlock",
        classOf[Array[Float]], classOf[Int], classOf[Int],
        classOf[Array[Float]], classOf[Int], classOf[Array[Int]]))
    } catch { case _: Throwable => None }

  /** [[AssignKernel.scoreBlock]], resolved under the same module probe. */
  private[quantizers] lazy val simdScoreKernel: Option[java.lang.reflect.Method] =
    try {
      Class.forName("jdk.incubator.vector.FloatVector")
      Some(Class.forName("graft.quantizers.AssignKernel").getMethod("scoreBlock",
        classOf[Array[Float]], classOf[Int], classOf[Int],
        classOf[Array[Float]], classOf[Int], classOf[Array[Float]]))
    } catch { case _: Throwable => None }

  /** Max training points per centroid — the Faiss Clustering default
    * (max_points_per_centroid = 256): coarse-quantizer k-means is always
    * trained on a bounded subsample, never the full corpus, because centroid
    * quality saturates long before that and full-corpus Lloyd's at 100 TB
    * would be all shuffle for no gain. The reference inherits exactly this
    * behavior through faiss::Clustering (lintdb/quantizers/impl/kmeans.cpp). */
  val MaxPointsPerCentroid = 256

  /** Two-level (grouped-centroid) assignment for the TRAINING iterations at
    * production K. Exhaustive Lloyd's assignment is O(sample·K·dim) with
    * sample ∝ K — QUADRATIC in K, the wall that turns corpus-scaled K
    * (K ~ c·√N) into hours of train past K≈50k. The standard fix (Faiss
    * IVF-on-IVF / hierarchical k-means): cluster the K centroids into
    * G ≈ √K groups, score each point against the G group centers, then
    * exactly against only the members of its top-`probes` groups —
    * O(sample·(G + probes·K/G)·dim), ~K/(2√K·probes)-fold fewer flops.
    * Assignment becomes approximate (a true nearest centroid in an
    * unprobed group is missed); for TRAINING that only perturbs which mean
    * a point contributes to — Lloyd's still converges, and
    * TwoLevelTrainSpec measures the end-to-end objective parity. The FINAL
    * model and every serving-path assignment (add's assignBlock, search
    * planning) stay exhaustive and exact. Deterministic: group clustering
    * is the seeded [[lloyd]], both scoring levels run the deterministic
    * score kernels, and all selection ties break on the lower id. */
  val TwoLevelMinKKey = "spark.graft.train.twoLevelMinK"
  val TwoLevelMinKDefault = 8192
  val TwoLevelProbesKey = "spark.graft.train.twoLevelProbes"
  val TwoLevelProbesDefault = 8

  /** Augment centroids with a trailing -‖c‖²/2 bias column so the IP score
    * kernels compute the argmin-L2 score directly (see [[lloyd]]'s
    * augmented-layout note). */
  private def augmentedQ(cs: Array[Array[Float]]): CoarseQuantizer = {
    val d = cs(0).length
    new CoarseQuantizer(cs.map { ce =>
      var s = 0.0
      var i = 0
      while (i < d) { s += ce(i).toDouble * ce(i); i += 1 }
      val a = java.util.Arrays.copyOf(ce, d + 1)
      a(d) = (-s / 2).toFloat
      a
    })
  }

  /** Broadcast-able two-level assignment plan: group-center scorer,
    * per-group member scorers, and the members' global centroid ids. Built
    * once per Lloyd iteration (or per add() batch) on the driver (group
    * clustering is [[lloyd]] over the K centroids — O(K·G·dim), seconds);
    * the CoarseQuantizers' transposed kernels are @transient-lazy, so each
    * executor materializes them once per broadcast.
    *
    * Two metrics share the plan shape: `augmented = true` (the TRAIN path)
    * scores argmin-L2 through the trailing -‖c‖²/2 bias column;
    * `augmented = false` ([[TwoLevelPlan.buildIp]], the opt-in add() path)
    * scores raw inner product — the metric production assignment uses
    * (CoarseQuantizer.cpp:108-110), so with probes >= numGroups the
    * decision is bit-identical to [[CoarseQuantizer.assignBlock]] (every
    * centroid scored by the same kernel accumulation order, ties to the
    * lower global id — pinned by TwoLevelAssignSpec). */
  private[graft] final case class TwoLevelPlan(
      groupQ: CoarseQuantizer,
      memberQ: Array[CoarseQuantizer],
      memberIds: Array[Array[Int]],
      dim: Int,
      probes: Int,
      augmented: Boolean = true) extends Serializable with ChunkDecider {

    def decideChunk(points: Array[Array[Float]]): Array[Int] = {
      val m = points.length
      if (m == 0) return Array.emptyIntArray
      val d = dim
      val flat = new Array[Float](m * d)
      var p = 0
      while (p < m) {
        val v = points(p)
        require(v.length == d, s"point has dim ${v.length}, expected $d")
        System.arraycopy(v, 0, flat, p * d, d)
        p += 1
      }
      decideFlat(flat, m)
    }

    /** Decide assignments for a flattened row-major (n x dim) block — the
      * add() encode path's native shape (no per-point array wrapping). */
    def decideFlat(flat: Array[Float], m: Int): Array[Int] = {
      if (m == 0) return Array.emptyIntArray
      val d = dim
      require(flat.length == m * d, s"decideFlat: ${flat.length} floats != $m x $d")
      val da = if (augmented) d + 1 else d
      val g = memberIds.length
      val flatAug =
        if (!augmented) flat
        else {
          val buf = new Array[Float](m * da)
          var p = 0
          while (p < m) {
            System.arraycopy(flat, p * d, buf, p * da, d)
            buf(p * da + d) = 1f
            p += 1
          }
          buf
        }
      var p = 0
      val gScores = groupQ.scoreBlock(flatAug, m)
      // top-`probes` groups per point (skipping member-less groups),
      // deterministic: score desc, group id asc
      val nProbe = math.min(probes, g)
      val buckets = Array.fill(g)(new scala.collection.mutable.ArrayBuffer[Int])
      p = 0
      while (p < m) {
        val so = p * g
        var taken = 0
        val used = new Array[Boolean](g)
        while (taken < nProbe) {
          var best = -1
          var bs = Float.NegativeInfinity
          var c = 0
          while (c < g) {
            if (!used(c) && memberIds(c).length > 0 && gScores(so + c) > bs) {
              bs = gScores(so + c); best = c
            }
            c += 1
          }
          if (best < 0) taken = nProbe // no more non-empty groups
          else {
            used(best) = true
            buckets(best) += p
            taken += 1
          }
        }
        p += 1
      }
      val bestScore = Array.fill(m)(Float.NegativeInfinity)
      val bestId = Array.fill(m)(Int.MaxValue)
      var grp = 0
      while (grp < g) {
        val idxs = buckets(grp)
        if (idxs.nonEmpty) {
          val mm = idxs.length
          val block = new Array[Float](mm * da)
          var t = 0
          while (t < mm) {
            System.arraycopy(flatAug, idxs(t) * da, block, t * da, da)
            t += 1
          }
          val ids = memberIds(grp)
          val nc = ids.length
          val sc = memberQ(grp).scoreBlock(block, mm)
          t = 0
          while (t < mm) {
            val pi = idxs(t)
            val so = t * nc
            var c = 0
            while (c < nc) {
              val s = sc(so + c)
              val cid = ids(c)
              if (s > bestScore(pi) || (s == bestScore(pi) && cid < bestId(pi))) {
                bestScore(pi) = s
                bestId(pi) = cid
              }
              c += 1
            }
            t += 1
          }
        }
        grp += 1
      }
      // all-NaN scores probe no group (NaN > x is false), leaving the
      // Int.MaxValue initializer — fall back to centroid 0, the id the
      // exact scan's `best = 0` initializer yields for the same input
      p = 0
      while (p < m) {
        if (bestId(p) == Int.MaxValue) bestId(p) = 0
        p += 1
      }
      bestId
    }
  }

  private[graft] object TwoLevelPlan {
    /** One builder for both metrics: groups are built GEOMETRICALLY
      * (seeded [[lloyd]] over the centroid matrix + exact argmin-L2
      * membership — a partition heuristic, metric-free); `augmented`
      * selects how the plan SCORES (trailing-bias argmin-L2 for the train
      * path, raw IP for the add() path). min(k, ·) keeps small-K callers
      * (specs, tiny indexes) from asking lloyd for more clusters than
      * points. */
    private def buildWith(cents: Array[Array[Float]], probes: Int,
        seed: Long, augmented: Boolean): TwoLevelPlan = {
      val k = cents.length
      val dim = cents(0).length
      val g = math.min(k,
        math.max(probes * 2, math.ceil(math.sqrt(k.toDouble)).toInt))
      val centers = lloyd(cents, g, iters = 3, seed)
      // exact membership of each centroid in its nearest group
      val grp = new ExactL2Assigner(centers).decideChunk(cents)
      val members = Array.fill(g)(new scala.collection.mutable.ArrayBuffer[Int])
      var c = 0
      while (c < k) { members(grp(c)) += c; c += 1 }
      val memberIds = members.map(_.toArray)
      def q(cs: Array[Array[Float]]): CoarseQuantizer =
        if (augmented) augmentedQ(cs) else new CoarseQuantizer(cs)
      val memberQ = memberIds.map { ids =>
        if (ids.isEmpty) null else q(ids.map(cents))
      }
      TwoLevelPlan(q(centers), memberQ, memberIds, dim, probes, augmented)
    }

    def build(cents: Array[Array[Float]], probes: Int,
        seed: Long): TwoLevelPlan =
      buildWith(cents, probes, seed, augmented = true)

    /** Inner-product variant for the HARNESS-ONLY approximate assignment
      * ([[graft.index.IndexIVF]] addWithApproxAssignForHarness): BOTH
      * scoring levels run the raw IP kernel, the metric production
      * assignment uses (reference CoarseQuantizer.cpp:108-110), so the
      * probed decision approximates argmax-IP, not argmin-L2. With
      * probes >= numGroups every centroid is scored by the same kernel
      * accumulation order as [[CoarseQuantizer.assignBlock]] and ties break
      * to the lower global id — bit-identical to the exact scan
      * (TwoLevelAssignSpec). */
    def buildIp(cents: Array[Array[Float]], probes: Int,
        seed: Long): TwoLevelPlan =
      buildWith(cents, probes, seed, augmented = false)
  }

  /** Train k-means over a DataFrame with a `vec: array<float>` column of
    * token embeddings (reference train: lintdb/index.cpp:250-254).
    *
    * Distributed work is ONE pass: a seeded uniform sample of at most
    * `numCentroids * MaxPointsPerCentroid` vectors is collected (bounded at
    * any corpus size), then Lloyd's runs driver-local on primitive arrays —
    * the same shape as the reference's Faiss training, where clustering also
    * happens in-process on a subsample. Driver-local is NOT single-core:
    * the O(sample·K·dim) assignment term runs the SIMD score kernel across
    * all cores (see [[lloyd]]), the treatment Faiss gets from OpenMP. Only
    * the sample collect and the O(sample·dim) mean updates are sequential.
    * Assignment of the full corpus (the per-token argmax that touches all
    * data) stays distributed via the broadcast [[CoarseQuantizer]]. Fixed
    * seed for determinism at any thread count. */
  def train(tokens: DataFrame, numCentroids: Int, numIterations: Int,
      seed: Long = 42L): CoarseQuantizer = {
    val head = tokens.select(col("vec")).limit(1).collect()
    require(head.nonEmpty, "cannot train on an empty token set")
    val dim = head(0).getAs[scala.collection.Seq[Float]](0).length
    val maxSample = numCentroids.toLong * MaxPointsPerCentroid
    // production-K dispatch: a sample that would blow the driver-heap
    // budget trains distributed instead of being collected (at K=65536,
    // dim=128 the 256/centroid sample alone is ~8.6 GB — the r8 verdict's
    // one named 100x reservation). The budget is a conf knob so a fat
    // driver can deliberately raise it.
    val budget = tokens.sparkSession.conf
      .get(MaxLocalSampleBytesKey, MaxLocalSampleBytesDefault.toString).toLong
    if (maxSample * dim.toLong * 4 > budget)
      return trainDistributed(tokens, numCentroids, numIterations, seed)
    // optimistic single job: if the corpus fits the sample budget, one
    // bounded collect IS the sample (no count needed); only a larger corpus
    // pays for the count + uniform-sample pass
    val probe = tokens.select(col("vec")).limit(maxSample.toInt + 1).collect()
    val points =
      if (probe.length <= maxSample) probe.map(_.getAs[scala.collection.Seq[Float]](0).toArray)
      else {
        // corpus exceeds the budget: a limit() would be partition-biased, so
        // take a seeded uniform sample instead (bounded: fraction is sized
        // to land ~1.1 * maxSample rows whatever the corpus size)
        val n = tokens.count()
        tokens.sample(withReplacement = false,
          // slight oversample so the post-sample row count is >= maxSample whp
          math.min(1.0, maxSample.toDouble / n * 1.1), seed)
          .select(col("vec")).collect()
          .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
          .take(maxSample.toInt)
      }
    require(points.nonEmpty, "cannot train on an empty token set")
    new CoarseQuantizer(lloyd(points, numCentroids, numIterations, seed))
  }

  /** Conf knob: driver-heap budget (bytes) for [[train]]'s local sample.
    * A request whose K·[[MaxPointsPerCentroid]] sample estimate exceeds it
    * dispatches to [[trainDistributed]]. 1 GiB default: generous for every
    * bench/test shape (K=4096, dim=128 is ~537 MB) while keeping a
    * production-K request (K=65536, dim=128 ≈ 8.6 GB) off the driver. */
  val MaxLocalSampleBytesKey = "spark.graft.train.maxLocalSampleBytes"
  val MaxLocalSampleBytesDefault: Long = 1L << 30

  /** Distributed-sample Lloyd's for production K — the scale path of
    * [[train]] (reference-scale note: the reference trains in-process via
    * Faiss with the same 256/centroid bound, lintdb/quantizers/impl/
    * kmeans.cpp:11-35; in-process is exactly what stops scaling at
    * K=65536·dim=128, where the sample is ~8.6 GB).
    *
    * Same bounded-sample semantics as the local path, but the sample stays
    * an executor-resident cached RDD. Each iteration broadcasts the
    * centroid matrix, decides per-point assignments inside each partition
    * through the SAME [[ExactL2Assigner]] decision kernel as the local
    * trainer (chunked through the SIMD score kernel), accumulates sparse
    * per-centroid (sum, count) partials per partition, and merges partials
    * per centroid. Driver state is O(K·dim) — the centroid matrix and the
    * merged per-centroid means — never O(sample).
    *
    * Determinism: the sample is content-hash repartitioned and sorted
    * within partitions, so partition membership AND in-partition order —
    * hence every partial sum — are a pure function of the sampled multiset
    * of vectors, not of the input's split layout or shuffle fetch order;
    * per-centroid partials then merge in ascending partition order. Two
    * runs over the same sample produce bit-identical centroids (pinned by
    * KMeansParitySpec). What is NOT preserved is [[lloyd]]'s sequential
    * summation order: local and distributed centroids agree to float
    * rounding, not bitwise (near-tie assignment flips between the two are
    * possible on later iterations by design — both remain exact argmin-L2
    * against their own centroids). Init is the K hash-least sample points;
    * an emptied cluster reseeds from that init pool (the local path
    * reseeds from its in-heap sample, which this path deliberately does
    * not have). */
  def trainDistributed(tokens: DataFrame, numCentroids: Int,
      numIterations: Int, seed: Long = 42L): CoarseQuantizer = {
    val spark = tokens.sparkSession
    val sc = spark.sparkContext
    val maxSample = numCentroids.toLong * MaxPointsPerCentroid
    val n = tokens.count()
    require(n > 0, "cannot train on an empty token set")
    val frac = math.min(1.0, maxSample.toDouble / n * 1.1)
    val sampleDf =
      if (frac >= 1.0) tokens.select(col("vec"))
      else tokens.select(col("vec")).sample(withReplacement = false, frac, seed)
    // content-hash partitioning + in-partition sort: see determinism note
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val canonical = sampleDf
      .repartition(parts, xxhash64(lit(seed), col("vec")))
      .sortWithinPartitions(col("vec"))
    val sample = canonical.rdd.map(_.getSeq[Float](0).toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // init: K hash-least sample points — orderBy+limit plans as a
      // per-partition top-K merge (TakeOrderedAndProject), so the driver
      // receives K·dim floats, the size of the centroid matrix itself
      val rnd = new scala.util.Random(seed)
      var pool = sampleDf
        .orderBy(xxhash64(lit(seed + 1), col("vec")), col("vec"))
        .limit(numCentroids).collect()
        .map(_.getSeq[Float](0).toArray)
      val dim = pool(0).length
      while (pool.length < numCentroids)
        pool = pool :+ pool(rnd.nextInt(pool.length)).map(x => x + rnd.nextFloat() * 1e-4f)
      var cents = pool.take(numCentroids)

      // production-K assignment dispatch: past the knob, each training
      // iteration assigns through the two-level grouped plan (O(G +
      // probes·K/G) per point instead of O(K)) — see [[TwoLevelPlan]].
      val twoLevelMinK = spark.conf
        .get(TwoLevelMinKKey, TwoLevelMinKDefault.toString).toInt
      val twoLevelProbes = spark.conf
        .get(TwoLevelProbesKey, TwoLevelProbesDefault.toString).toInt
      val useTwoLevel = numCentroids >= twoLevelMinK

      var it = 0
      while (it < numIterations) {
        val bc = sc.broadcast(cents)
        val bcPlan =
          if (useTwoLevel)
            Some(sc.broadcast(
              TwoLevelPlan.build(cents, twoLevelProbes, seed + 7919L * (it + 1))))
          else None
        val dimL = dim
        val partials = sample.mapPartitionsWithIndex { (pid, rows) =>
          val asg: ChunkDecider = bcPlan match {
            case Some(pb) => pb.value
            case None => new ExactL2Assigner(bc.value)
          }
          // sparse per-partition accumulators: slot dim holds the count, so
          // one primitive array per touched centroid (≤ min(K, rows here))
          val sums = new scala.collection.mutable.LongMap[Array[Double]]()
          rows.grouped(256).foreach { chunk =>
            val pts = chunk.toArray
            val ids = asg.decideChunk(pts)
            var i = 0
            while (i < pts.length) {
              val acc = sums.getOrElseUpdate(ids(i), new Array[Double](dimL + 1))
              val v = pts(i)
              var d = 0
              while (d < dimL) { acc(d) += v(d); d += 1 }
              acc(dimL) += 1
              i += 1
            }
          }
          sums.iterator.map { case (c, acc) => (c.toInt, (pid, acc)) }
        }
        // merge each centroid's partials in ascending-partition order (the
        // canonical order — double addition does not reassociate freely);
        // result (bounded: one row per centroid — the groupByKey key is the
        // centroid id, so ≤ numCentroids rows of dim+1 doubles reach the
        // driver)
        val merged = partials.groupByKey(math.min(parts, 64)).mapValues { ps =>
          val sorted = ps.toArray.sortBy(_._1)
          val acc = new Array[Double](dimL + 1)
          sorted.foreach { case (_, s) =>
            var i = 0; while (i <= dimL) { acc(i) += s(i); i += 1 }
          }
          acc
        }.collect()
        bc.destroy()
        bcPlan.foreach(_.destroy())
        val byId = merged.toMap
        cents = Array.tabulate(numCentroids) { c =>
          byId.get(c) match {
            case Some(acc) if acc(dimL) > 0 =>
              val cnt = acc(dimL)
              Array.tabulate(dimL)(i => (acc(i) / cnt).toFloat)
            case _ => pool(rnd.nextInt(pool.length)).clone
          }
        }
        it += 1
      }
      new CoarseQuantizer(cents)
    } finally sample.unpersist(blocking = false)
  }

  /** Driver-local Lloyd's iterations, Euclidean assignment (argmin-L2 ==
    * argmax-IP on L2-normalized embeddings — see class doc). Init = seeded
    * random distinct samples, matching Faiss's random-sample init; empty
    * clusters are re-seeded from a random point (Faiss splits clusters —
    * same effect: no dead clusters).
    *
    * The O(n·K·dim) assignment term runs through the SIMD score kernel in
    * parallel point chunks ([[assignExactL2]]) — the reference gets the same
    * treatment from Faiss's OpenMP+SIMD clustering (kmeans.cpp:11-35). The
    * decisions (and therefore the centroids) are bit-identical to
    * [[lloydScalarReference]] by construction: float-precision near-ties are
    * re-decided by the reference's own double-precision comparison. The
    * cheap O(n·dim) sums/update pass stays the reference's sequential code
    * verbatim, so no floating-point reassociation can creep in there either.
    * KMeansParitySpec pins fast == reference on gaussian blobs, exact
    * symmetric ties, k > n padding, and a catastrophic-cancellation corpus
    * that forces the recheck path on nearly every point. */
  private[graft] def lloyd(points: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val n = points.length
    val dim = points(0).length
    var cents: Array[Array[Float]] =
      rnd.shuffle(points.indices.toVector).take(math.min(k, n))
        .map(i => points(i).clone).toArray
    // fewer distinct points than centroids: pad with jittered repeats
    while (cents.length < k)
      cents = cents :+ cents(rnd.nextInt(cents.length)).map(x => x + rnd.nextFloat() * 1e-4f)

    // augmented flat copy of the sample, built once: [v_0..v_{dim-1}, 1f].
    // The constant trailing 1 turns the per-centroid bias -‖c‖²/2 into one
    // extra "dimension", so the UNMODIFIED IP kernels compute the argmin-L2
    // score IP(v,c) - ‖c‖²/2 directly (argmin-L2 == argmax of that).
    val da = dim + 1
    val flatAug = new Array[Float](n * da)
    val normV = new Array[Double](n)
    var p0 = 0
    while (p0 < n) {
      val v = points(p0); val o = p0 * da
      var s = 0.0; var i = 0
      while (i < dim) { val x = v(i); flatAug(o + i) = x; s += x.toDouble * x; i += 1 }
      flatAug(o + dim) = 1f
      normV(p0) = math.sqrt(s)
      p0 += 1
    }

    var it = 0
    while (it < iters) {
      val assign = assignExactL2(points, flatAug, normV, cents)
      // sums/update: the reference loop verbatim (sequential point order —
      // O(n·dim), ~1000× cheaper than assignment, so not worth threading
      // at the cost of double-addition reassociation)
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Int](k)
      var p = 0
      while (p < n) {
        val v = points(p)
        val best = assign(p)
        counts(best) += 1
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        p += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) points(rnd.nextInt(n)).clone
        else {
          val a = new Array[Float](dim)
          var i = 0
          while (i < dim) { a(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
          a
        }
      }
      it += 1
    }
    cents
  }

  /** Exact argmin-L2 assignment of every sample point to `cents`: parallel
    * over fixed 256-point chunks (fork-join common pool; chunks are
    * independent, so the result is deterministic at ANY thread count), with
    * the O(n·K·dim) score fill inside [[CoarseQuantizer.scoreBlock]] — the
    * SIMD kernel when the incubator module is present, its bit-identical
    * scalar twin otherwise.
    *
    * Exactness guard: a lane-accumulated float score differs from the real
    * value by at most γ·(‖v‖·Cmax + Cmax²/2) with γ = (dim+2)·2⁻²⁴ (one
    * rounded multiply-add per dimension; Σ|v_i·c_i| ≤ ‖v‖‖c‖), inflated 4×
    * to also absorb the bias-term rounding and the reference loop's own
    * double rounding. A row whose float runner-up lands within twice that
    * slack of the float max — including every exact tie — is re-decided by
    * the reference's double-precision argmin (ascending ids, strict less)
    * over the inside-slack shortlist, which provably contains the reference
    * winner. Decisions therefore match [[lloydScalarReference]] exactly, not
    * just with high probability. */
  private def assignExactL2(points: Array[Array[Float]], flatAug: Array[Float],
      normV: Array[Double], cents: Array[Array[Float]]): Array[Int] = {
    val asg = new ExactL2Assigner(cents)
    val n = points.length
    val out = new Array[Int](n)
    val chunk = 256
    val nChunks = (n + chunk - 1) / chunk
    java.util.stream.IntStream.range(0, nChunks).parallel().forEach { ci =>
      val from = ci * chunk
      asg.decide(points, flatAug, normV, from, math.min(chunk, n - from), out)
    }
    out
  }

  /** The exact argmin-L2 decision kernel of [[assignExactL2]], factored so
    * the driver-local trainer ([[lloyd]], parallel chunks of one in-heap
    * sample) and the distributed-sample trainer ([[trainDistributed]],
    * sequential chunks inside each executor partition) share ONE decision
    * path: float SIMD score argmax under the slack bound, near-ties
    * re-decided by the reference's double-precision argmin. Decisions are
    * per-point, so chunk boundaries and execution order never change them.
    * Constructed per use-site from a plain centroid matrix (on executors:
    * from a broadcast value) — the instance itself is never serialized. */
  /** Per-chunk point→centroid decision, shared by the exact assigner and
    * the two-level training assigner. */
  private[graft] trait ChunkDecider extends Serializable {
    def decideChunk(points: Array[Array[Float]]): Array[Int]
  }

  private[graft] final class ExactL2Assigner(cents: Array[Array[Float]])
      extends ChunkDecider {
    private val k = cents.length
    val dim: Int = cents(0).length
    val da: Int = dim + 1
    private var maxNorm2 = 0.0
    private val q = {
      val aug = Array.tabulate(k) { c =>
        val ce = cents(c)
        var s = 0.0; var i = 0
        while (i < dim) { s += ce(i).toDouble * ce(i); i += 1 }
        if (s > maxNorm2) maxNorm2 = s
        val a = java.util.Arrays.copyOf(ce, da)
        a(dim) = (-s / 2).toFloat
        a
      }
      new CoarseQuantizer(aug)
    }
    private val maxNormC = math.sqrt(maxNorm2)
    private val gamma = 4.0 * (dim + 2) / (1 << 24).toDouble

    /** Decide points [from, from+m) of a sample laid out in [[lloyd]]'s
      * augmented flat form; writes `out(from+t)`. */
    def decide(points: Array[Array[Float]], flatAug: Array[Float],
        normV: Array[Double], from: Int, m: Int, out: Array[Int]): Unit = {
      val block = new Array[Float](m * da)
      System.arraycopy(flatAug, from * da, block, 0, m * da)
      val scores = q.scoreBlock(block, m)
      var t = 0
      while (t < m) {
        val so = t * k
        val p = from + t
        var best = 0; var bs = Float.NegativeInfinity
        var second = Float.NegativeInfinity
        var c = 0
        while (c < k) {
          val s = scores(so + c)
          if (s > bs) { second = bs; bs = s; best = c }
          else if (s > second) second = s
          c += 1
        }
        val slack = (gamma * (normV(p) * maxNormC + maxNorm2 / 2)).toFloat
        if (second >= bs - 2 * slack) {
          // float-precision near-tie (or exact tie): reference decision
          val v = points(p)
          val cut = bs - 2 * slack
          var bestE = 0; var bd = Double.MaxValue
          c = 0
          while (c < k) {
            if (scores(so + c) >= cut) {
              val ce = cents(c)
              var d = 0.0; var i = 0
              while (i < dim) { val diff = v(i) - ce(i); d += diff * diff; i += 1 }
              if (d < bd) { bd = d; bestE = c }
            }
            c += 1
          }
          out(p) = bestE
        } else out(p) = best
        t += 1
      }
    }

    /** Standalone chunk decision: builds the augmented layout for `points`
      * itself — the per-partition shape of [[trainDistributed]]. */
    def decideChunk(points: Array[Array[Float]]): Array[Int] = {
      val m = points.length
      val flatAug = new Array[Float](m * da)
      val normV = new Array[Double](m)
      var p = 0
      while (p < m) {
        val v = points(p); val o = p * da
        var s = 0.0; var i = 0
        while (i < dim) { val x = v(i); flatAug(o + i) = x; s += x.toDouble * x; i += 1 }
        flatAug(o + dim) = 1f
        normV(p) = math.sqrt(s)
        p += 1
      }
      val out = new Array[Int](m)
      decide(points, flatAug, normV, 0, m, out)
      out
    }
  }

  /** The pre-round-9 single-threaded trainer, kept verbatim as the parity
    * reference for [[lloyd]] (KMeansParitySpec, ProfMain `train_scale`):
    * per-point argmin over double-precision squared L2 with strict-less
    * lowest-id ties, sequential sums. */
  private[graft] def lloydScalarReference(points: Array[Array[Float]], k: Int,
      iters: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val n = points.length
    val dim = points(0).length
    var cents: Array[Array[Float]] =
      rnd.shuffle(points.indices.toVector).take(math.min(k, n))
        .map(i => points(i).clone).toArray
    while (cents.length < k)
      cents = cents :+ cents(rnd.nextInt(cents.length)).map(x => x + rnd.nextFloat() * 1e-4f)

    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Int](k)
      var p = 0
      while (p < n) {
        val v = points(p)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          val ce = cents(c)
          var d = 0.0; var i = 0
          while (i < dim) { val diff = v(i) - ce(i); d += diff * diff; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        p += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) points(rnd.nextInt(n)).clone
        else {
          val a = new Array[Float](dim)
          var i = 0
          while (i < dim) { a(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
          a
        }
      }
      it += 1
    }
    cents
  }

  def load(path: String): CoarseQuantizer = {
    val m = Json.read(path, classOf[Map[String, Any]])
    val cents = m("centroids").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Number].floatValue()).toArray)
      .toArray
    new CoarseQuantizer(cents)
  }
}
