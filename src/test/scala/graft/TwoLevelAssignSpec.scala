package graft

import graft.core._
import graft.index.IndexIVF
import graft.query._
import graft.quantizers.CoarseQuantizer
import org.scalatest.funsuite.AnyFunSuite

/** Pins the HARNESS-ONLY approximate assignment
  * (IndexIVF.addWithApproxAssignForHarness -> TwoLevelPlan.buildIp;
  * demoted from the production `spark.graft.add.assignProbes` conf knob in
  * r17 — every measured setting lost >= 18 pp success@5 on both corpus
  * geometries at every doc width, receipts in COVERAGE.md rounds 15-16):
  *
  * 1. EXHAUSTIVE parity: with probes >= numGroups every centroid is scored
  *    through the same kernel accumulation order as assignBlock, so the
  *    two-level decision is BIT-identical to the exact scan (including the
  *    duplicate-centroid tie-break to the lower global id).
  * 2. The approximate decision (probes < numGroups) is deterministic and
  *    always one of the true centroid ids.
  * 3. E2E: the harness entry point actually reroutes the encode pass
  *    (postings differ from the exact build at probes=1 on this fixture),
  *    production add() stays bit-identical to exact, and — because the
  *    residual codec encodes the RAW token vector (reference quirk,
  *    DocProcessor.cpp:209-229), never a centroid-relative residual — an
  *    EXHAUSTIVE-probe search over the approximately-assigned index
  *    returns exactly the same ranked results as over the exact index:
  *    approximation moves which posting list a token lives in, not any
  *    score.
  */
class TwoLevelAssignSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkCents(k: Int, dim: Int, seed: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    val cents = Array.fill(k)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    if (k >= 8) { // duplicate rows force exact score ties
      cents(k / 2) = cents(1).clone
      cents(k - 1) = cents(0).clone
    }
    cents
  }

  test("buildIp with probes >= numGroups is bit-identical to assignBlock") {
    for (seed <- 0 until 3; k <- Seq(9, 64, 200); dim <- Seq(8, 32)) {
      val cents = mkCents(k, dim, seed)
      val cq = new CoarseQuantizer(cents)
      // probes = k guarantees probes >= g whatever g buildIp picked
      val plan = CoarseQuantizer.TwoLevelPlan.buildIp(cents, probes = k,
        seed = seed + 77L)
      assert(!plan.augmented)
      val rnd = new scala.util.Random(seed + 500)
      for (n <- Seq(1, 7, 64)) {
        val flat = Array.fill(n * dim)(rnd.nextFloat() * 2f - 1f)
        if (n >= 2) // duplicate token exercises identical decisions
          System.arraycopy(flat, 0, flat, (n - 1) * dim, dim)
        val exact = cq.assignBlock(flat, n)
        val two = plan.decideFlat(flat, n)
        assert(two.toSeq == exact.toSeq,
          s"exhaustive two-level != exact: seed=$seed k=$k dim=$dim n=$n")
      }
    }
  }

  test("approximate probes: deterministic, valid ids, near-exact on separated clusters") {
    val dim = 16
    val g = 8
    val rnd = new scala.util.Random(11)
    // well-separated cluster anchors, 8 centroids jittered around each
    val anchors = Array.fill(g)(Array.fill(dim)(rnd.nextFloat() * 20f - 10f))
    val cents = anchors.flatMap { a =>
      Array.fill(8)(Array.tabulate(dim)(j => a(j) + rnd.nextFloat() - 0.5f))
    }
    val cq = new CoarseQuantizer(cents)
    val plan = CoarseQuantizer.TwoLevelPlan.buildIp(cents, probes = 2, seed = 3L)
    val n = 500
    // tokens near anchors: the winning group is unambiguous
    val flat = new Array[Float](n * dim)
    (0 until n).foreach { i =>
      val a = anchors(rnd.nextInt(g))
      (0 until dim).foreach(j => flat(i * dim + j) = a(j) + rnd.nextFloat() - 0.5f)
    }
    val exact = cq.assignBlock(flat, n)
    val two = plan.decideFlat(flat, n)
    val two2 = plan.decideFlat(flat, n)
    assert(two.toSeq == two2.toSeq, "approximate decision must be deterministic")
    assert(two.forall(id => id >= 0 && id < cents.length))
    val agree = two.indices.count(i => two(i) == exact(i))
    assert(agree >= (n * 0.98).toInt,
      s"agreement $agree/$n below 98% on well-separated clusters")
  }

  test("all-NaN token falls back to centroid 0, matching the exact scan") {
    val dim0 = 8
    val cents = mkCents(16, dim0, 5)
    val cq = new CoarseQuantizer(cents)
    val plan = CoarseQuantizer.TwoLevelPlan.buildIp(cents, probes = 1, seed = 9L)
    // one NaN token between two normal ones: NaN scores probe no group
    val rnd = new scala.util.Random(6)
    val flat = Array.fill(3 * dim0)(rnd.nextFloat())
    java.util.Arrays.fill(flat, dim0, 2 * dim0, Float.NaN)
    val two = plan.decideFlat(flat, 3)
    val exact = new Array[Int](3)
    cq.assignBlockScalar(flat, 3, exact)
    assert(two(1) == 0 && exact(1) == 0,
      "NaN token must assign to centroid 0 on both paths")
    assert(two.forall(id => id >= 0 && id < cents.length))
  }

  private val dim = 16
  private val corpus: Map[Long, Seq[Seq[Float]]] = {
    val rnd = new scala.util.Random(42)
    (0L until 50L).map { i =>
      i -> Seq.fill(4)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toMap
  }

  private def docsDf = {
    import spark.implicits._
    corpus.toSeq.sortBy(_._1).map { case (i, toks) => (i, toks) }
      .toDF("id", "colbert")
  }

  private def postings(idx: IndexIVF): Seq[(Long, Long)] = {
    import org.apache.spark.sql.functions.col
    idx.postingsDf.select(col("doc_id"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  test("harness entry reroutes assignment; exhaustive search results are unchanged") {
    val schema = GSchema(Seq(GField.colbert("colbert", dim, numCentroids = 16,
      quantization = QuantizerKind.NONE, numIterations = 4, nbits = 2)))
    val base = IndexIVF.create(spark,
      java.nio.file.Files.createTempDirectory("tl_exact").toString, schema)
    base.train(docsDf)
    base.add(1, docsDf)

    // same trained models, approximate assignment via the harness entry
    val approx = IndexIVF.copyTrained(base,
      java.nio.file.Files.createTempDirectory("tl_approx").toString)
    approx.addWithApproxAssignForHarness(1, docsDf, assignProbes = 1)

    // probes >= numGroups == exact, bit-identical postings
    val exhaust = IndexIVF.copyTrained(base,
      java.nio.file.Files.createTempDirectory("tl_exhaust").toString)
    exhaust.addWithApproxAssignForHarness(1, docsDf, assignProbes = 999)

    val pBase = postings(base)
    val pApprox = postings(approx)
    val pExhaust = postings(exhaust)
    assert(pExhaust == pBase,
      "probes >= numGroups must reproduce the exact assignment bit-identically")
    assert(pApprox != pBase,
      "fixture vacuous: probes=1 produced the exact assignment — repick seeds")
    assert(pApprox.map(_._1).distinct == pBase.map(_._1).distinct,
      "every doc must still have posting rows")

    // exhaustive probing makes search results independent of assignment:
    // phase-1 scans every list either way, and phase-2 scores decode the
    // RAW-vector codes, which never depended on the assigned centroid
    val opts = SearchOptions(kTopCentroids = 16, nProbe = 16,
      numSecondPass = 200)
    val q = VectorQuery("colbert", corpus(7L).map(_.toArray).toArray)
    def top(idx: IndexIVF) =
      idx.search(1, q, k = 10, opts).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    assert(top(approx) == top(base),
      "exhaustive search must be invariant to the assignment approximation")
  }
}
