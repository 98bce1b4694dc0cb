package graft

import graft.scoring.Plaid
import org.scalatest.funsuite.AnyFunSuite

/** Algorithm-equivalence tests for the PLAID kernels: a naive inline
  * reimplementation compared against the production kernels — the same
  * strategy as the reference's tests/plaid_test.cpp:46-110. */
class PlaidSpec extends AnyFunSuite {

  test("colbertCentroidScore: per-query-token max over UNIQUE codes, summed") {
    // 2 query tokens, 3 centroids
    val scores = Array(
      0.1f, 0.9f, 0.5f, // qtoken 0
      0.7f, 0.2f, 0.3f) // qtoken 1
    // doc codes 1,1,2 -> unique {1,2}; qt0 max(0.9,0.5)=0.9; qt1 max(0.2,0.3)=0.3
    val s = Plaid.colbertCentroidScore(Array(1L, 1L, 2L), scores, 2, 3)
    assert(math.abs(s - 1.2f) < 1e-6)
  }

  test("colbertCentroidScore equals naive reimplementation on random data") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 50) {
      val nq = 1 + rnd.nextInt(8)
      val nc = 2 + rnd.nextInt(20)
      val scores = Array.fill(nq * nc)(rnd.nextFloat())
      val codes = Array.fill(1 + rnd.nextInt(30))(rnd.nextInt(nc).toLong)
      val naive = (0 until nq).map { k =>
        codes.distinct.map(c => scores(k * nc + c.toInt)).max
      }.sum
      val got = Plaid.colbertCentroidScore(codes, scores, nq, nc)
      assert(math.abs(got - naive) < 1e-4, s"nq=$nq nc=$nc")
    }
  }

  test("scoreDocumentsByCodes: thresholded sum over unique codes") {
    val maxByCentroid = Array(0.5f, 0.4f, 0.9f)
    // threshold 0.45 drops centroid 1; codes 0,0,1,2 -> 0.5 + 0.9
    val s = Plaid.scoreDocumentsByCodes(maxByCentroid, Array(0L, 0L, 1L, 2L), 0.45f)
    assert(math.abs(s - 1.4f) < 1e-6)
  }

  test("scoreByResiduals: normalized exact MaxSim with 0-floored token max") {
    val dim = 4
    // query: 2 tokens
    val q = Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)
    // doc: 2 tokens: (2,0,0,0) -> normalizes to (1,0,0,0); (0,-3,0,0) -> (0,-1,0,0)
    val doc = Array(2f, 0f, 0f, 0f, 0f, -3f, 0f, 0f)
    val s = Plaid.scoreByResiduals(q, 2, doc, 2, dim, normalize = true)
    // qt0: max(1, 0) = 1; qt1: max(0, -1) floored at 0 = 0
    assert(math.abs(s - 1.0f) < 1e-6)
  }

  test("scoreByResiduals equals naive maxsim on random data (normalize)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 30) {
      val dim = 8
      val nq = 1 + rnd.nextInt(4)
      val nd = 1 + rnd.nextInt(6)
      val q = Array.fill(nq * dim)(rnd.nextFloat() * 2 - 1)
      val d = Array.fill(nd * dim)(rnd.nextFloat() * 2 - 1)
      val dn = d.clone()
      Plaid.l2NormalizeInPlace(dn, nd, dim)
      val naive = (0 until nq).map { j =>
        val best = (0 until nd).map { i =>
          (0 until dim).map(k => dn(i * dim + k) * q(j * dim + k)).sum
        }.max
        math.max(best, 0f)
      }.sum
      val got = Plaid.scoreByResiduals(q, nq, d.clone(), nd, dim, normalize = true)
      assert(math.abs(got - naive) < 1e-4)
    }
  }

  test("maxScoreByCentroid reduces (centroid, score) pairs to per-centroid max") {
    val got = Plaid.maxScoreByCentroid(
      Array(0, 1, 0, 2), Array(0.5f, 0.3f, 0.8f, 0.1f), 4)
    assert(got.toSeq == Seq(0.8f, 0.3f, 0.1f, 0.0f))
  }
}
