package graft

import graft.quantizers.CoarseQuantizer
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-9 parallel/SIMD coarse trainer ([[CoarseQuantizer.lloyd]])
  * bit-identical to the pre-round-9 single-threaded reference loop
  * ([[CoarseQuantizer.lloydScalarReference]]). The fast path decides
  * assignments from float SIMD scores with an error-bound guard and
  * re-decides float-precision near-ties with the reference's own
  * double-precision comparison, so equality here is a designed invariant —
  * these cases make sure the guard math (slack bound, shortlist, tie-break
  * direction) actually delivers it, including on inputs built to break it.
  */
class KMeansParitySpec extends AnyFunSuite {

  private def assertSame(a: Array[Array[Float]], b: Array[Array[Float]]): Unit = {
    assert(a.length == b.length)
    a.indices.foreach { i =>
      assert(java.util.Arrays.equals(a(i), b(i)), s"centroid $i differs")
    }
  }

  private def gaussian(n: Int, dim: Int, seed: Long,
      shift: Float = 0f, scale: Float = 1f): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian().toFloat * scale + shift))
  }

  test("gaussian blobs: fast == reference, and fast is deterministic") {
    val pts = gaussian(2000, 16, seed = 1)
    val fast = CoarseQuantizer.lloyd(pts, k = 64, iters = 4, seed = 42L)
    val ref = CoarseQuantizer.lloydScalarReference(pts, 64, 4, 42L)
    assertSame(fast, ref)
    assertSame(fast, CoarseQuantizer.lloyd(pts, 64, 4, 42L))
  }

  test("exact symmetric ties: grid data where many points tie between centroids") {
    // integer lattice points: distances between points and (lattice-derived)
    // centroids hit exact equality constantly; reference breaks ties to the
    // lowest centroid id via strict-less, and the fast path must re-decide
    // every float tie the same way
    val pts = (for (x <- 0 until 16; y <- 0 until 16)
      yield Array(x.toFloat, y.toFloat, ((x + y) % 2).toFloat)).toArray
    assertSame(
      CoarseQuantizer.lloyd(pts, k = 16, iters = 5, seed = 7L),
      CoarseQuantizer.lloydScalarReference(pts, 16, 5, 7L))
  }

  test("catastrophic cancellation: far-offset tight clusters force the recheck path") {
    // ‖v‖ ≈ ‖c‖ ≈ 3500 while inter-cluster score differences are O(1):
    // float IP loses ~all discriminating bits, the slack bound dwarfs the
    // margins, and nearly every row must fall through to the exact
    // double-precision re-decision — parity here proves the guard is sound,
    // not merely that the fast scores were good enough
    val rnd = new java.util.Random(3)
    val pts = Array.fill(800) {
      val blob = rnd.nextInt(4)
      Array.fill(48)(1000f + blob * 0.25f + rnd.nextGaussian().toFloat * 0.05f)
    }
    assertSame(
      CoarseQuantizer.lloyd(pts, k = 8, iters = 4, seed = 42L),
      CoarseQuantizer.lloydScalarReference(pts, 8, 4, 42L))
  }

  test("k > n: jittered-repeat padding stays on the shared seeded rng stream") {
    val pts = gaussian(5, 8, seed = 9)
    assertSame(
      CoarseQuantizer.lloyd(pts, k = 12, iters = 3, seed = 5L),
      CoarseQuantizer.lloydScalarReference(pts, 12, 3, 5L))
  }

  test("k == 1 and dim == 1 degenerate shapes") {
    val one = gaussian(100, 1, seed = 11)
    assertSame(
      CoarseQuantizer.lloyd(one, k = 1, iters = 2, seed = 1L),
      CoarseQuantizer.lloydScalarReference(one, 1, 2, 1L))
    val thin = gaussian(300, 1, seed = 13)
    assertSame(
      CoarseQuantizer.lloyd(thin, k = 7, iters = 3, seed = 2L),
      CoarseQuantizer.lloydScalarReference(thin, 7, 3, 2L))
  }
}
