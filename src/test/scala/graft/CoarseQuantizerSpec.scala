package graft

import graft.quantizers.CoarseQuantizer
import org.scalatest.funsuite.AnyFunSuite

/** Pins the GEMM-shaped block assignment (CoarseQuantizer.assignBlock) to
  * one canonical semantics: dim-ascending accumulation with per-product
  * rounding, argmax with ascending-id strict-> tie-break. Three anchors:
  * (1) the scalar twin equals a spec-local naive implementation of that
  * order; (2) the dispatched path (SIMD kernel when the Vector API is
  * present) is BIT-identical to the scalar twin across vector-width
  * remainder shapes; (3) ties (duplicate centroids, duplicate tokens) break
  * deterministically. */
class CoarseQuantizerSpec extends AnyFunSuite {

  private def mkQuantizer(k: Int, dim: Int, seed: Int): CoarseQuantizer = {
    val rnd = new scala.util.Random(seed)
    val cents = Array.fill(k)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    // plant duplicate centroid rows (exact score ties -> tie-break path)
    if (k >= 8) {
      cents(k / 2) = cents(1).clone
      cents(k - 1) = cents(0).clone
    }
    new CoarseQuantizer(cents)
  }

  /** The canonical order, written naively: score(c) = sum over ascending
    * dims of round(tok_i * cent_c_i), each product rounded before its add. */
  private def naiveAssign(cents: Array[Array[Float]], v: Array[Float]): Int = {
    val scores = cents.map { c =>
      var s = 0f; var i = 0
      while (i < v.length) { s += v(i) * c(i); i += 1 }
      s
    }
    var best = 0; var bs = Float.NegativeInfinity; var c = 0
    while (c < scores.length) {
      if (scores(c) > bs) { bs = scores(c); best = c }; c += 1
    }
    best
  }

  test("dispatched assignBlock == scalar twin == naive, across remainder shapes") {
    // k spans sub-/exact/multi-SIMD-register widths (any lane count 4..16);
    // n spans the 4-token register-block remainders
    for (seed <- 0 until 5; k <- Seq(3, 16, 64, 131); dim <- Seq(7, 16)) {
      val cq = mkQuantizer(k, dim, seed)
      val rnd = new scala.util.Random(seed + 1000)
      for (n <- Seq(1, 3, 4, 9, 64)) {
        val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
        if (n >= 2) vecs(n - 1) = vecs(0).clone // duplicate token
        val flat = new Array[Float](n * dim)
        vecs.zipWithIndex.foreach { case (v, i) =>
          System.arraycopy(v, 0, flat, i * dim, dim)
        }
        val dispatched = cq.assignBlock(flat, n)
        val scalar = new Array[Int](n)
        cq.assignBlockScalar(flat, n, scalar)
        assert(dispatched.toSeq == scalar.toSeq,
          s"SIMD vs scalar diverged: seed=$seed k=$k dim=$dim n=$n")
        val naive = vecs.map(v => naiveAssign(cq.centroids, v))
        assert(scalar.toSeq == naive.toSeq,
          s"scalar vs naive diverged: seed=$seed k=$k dim=$dim n=$n")
        assert(cq.assign(vecs(0)) == dispatched(0))
      }
    }
  }

  test("scoreBlock == scalar twin == sequential per-centroid dots, bit-exact") {
    for (seed <- 0 until 3; k <- Seq(5, 16, 67); dim <- Seq(7, 16)) {
      val cq = mkQuantizer(k, dim, seed)
      val rnd = new scala.util.Random(seed + 2000)
      for (n <- Seq(1, 4, 5)) {
        val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
        val flat = new Array[Float](n * dim)
        vecs.zipWithIndex.foreach { case (v, i) =>
          System.arraycopy(v, 0, flat, i * dim, dim)
        }
        val dispatched = cq.scoreBlock(flat, n)
        val scalar = new Array[Float](n * k)
        cq.scoreBlockScalar(flat, n, scalar)
        assert(dispatched.toSeq == scalar.toSeq,
          s"SIMD vs scalar scores diverged: seed=$seed k=$k dim=$dim n=$n")
        // the canonical order: per centroid, a sequential dim-ascending dot
        val naive = vecs.flatMap(v => cq.centroids.map { c =>
          var s = 0f; var i = 0
          while (i < dim) { s += v(i) * c(i); i += 1 }
          s
        })
        assert(scalar.toSeq == naive.toSeq,
          s"scalar vs naive scores diverged: seed=$seed k=$k dim=$dim n=$n")
        assert(cq.scoreAll(vecs(0)).toSeq == dispatched.take(k).toSeq)
      }
    }
  }

  test("assignBlock rejects a mis-sized flat array") {
    val cq = mkQuantizer(4, 8, 0)
    intercept[IllegalArgumentException](cq.assignBlock(new Array[Float](9), 1))
  }
}
