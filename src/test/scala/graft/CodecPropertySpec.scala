package graft

import graft.quantizers.{Binarizer, IdentityQuantizer, ProductEncoder, ScalarQuantizer8}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure codec kernels — the port of the reference's
  * gtest coverage of packbits/unpackbits and quantile bucketing
  * (tests/binarizer_test.cpp; SURVEY §5 flags these pure functions as the
  * ideal property targets). Seeded-random case generation (100 cases per
  * property) keeps runs deterministic.
  */
class CodecPropertySpec extends AnyFunSuite {

  val rnd = new scala.util.Random(20260812L)
  def vec(dim: Int): Array[Float] = Array.fill(dim)(rnd.nextFloat() * 4 - 2)
  val dims = Seq(8, 16, 32, 64)

  test("identity codec round-trips exactly") {
    (1 to 100).foreach { _ =>
      val v = vec(dims(rnd.nextInt(dims.length)))
      val q = IdentityQuantizer(v.length)
      assert(q.decode(q.encode(v)).toSeq == v.toSeq)
    }
  }

  test("sq8 reconstruction error <= scale/2 inside the trained range, clamped outside") {
    (1 to 100).foreach { _ =>
      val dim = dims(rnd.nextInt(dims.length))
      val sample = Array.fill(16)(vec(dim))
      val mins = Array.tabulate(dim)(i => sample.map(_(i)).min)
      val maxs = Array.tabulate(dim)(i => sample.map(_(i)).max)
      val q = ScalarQuantizer8.train(mins, maxs)
      assert(q.codeSize == dim)
      sample.foreach { v =>
        val d = q.decode(q.encode(v))
        v.indices.foreach { i =>
          assert(math.abs(d(i) - v(i)) <= q.scales(i) * 0.5f + 1e-6f,
            s"dim $i: ${v(i)} -> ${d(i)}, scale ${q.scales(i)}")
        }
      }
      // out-of-range values clamp to the range ends
      val lo = q.decode(q.encode(Array.fill(dim)(-100f)))
      val hi = q.decode(q.encode(Array.fill(dim)(100f)))
      lo.indices.foreach { i =>
        assert(lo(i) == q.mins(i))
        assert(hi(i) == q.mins(i) + 255f * q.scales(i))
      }
    }
  }

  test("sq8 re-encode of a decoded vector is idempotent; constant dims are exact") {
    (1 to 100).foreach { _ =>
      val dim = dims(rnd.nextInt(dims.length))
      val sample = Array.fill(8)(vec(dim))
      val mins = Array.tabulate(dim)(i => sample.map(_(i)).min)
      val maxs = Array.tabulate(dim)(i => sample.map(_(i)).max)
      val q = ScalarQuantizer8.train(mins, maxs)
      val v = sample(rnd.nextInt(sample.length))
      val c1 = q.encode(v)
      assert(q.encode(q.decode(c1)).toSeq == c1.toSeq)
    }
    // a constant dimension trains scale 1 and round-trips exactly
    val q = ScalarQuantizer8.train(Array(0.25f, -1f), Array(0.25f, 1f))
    assert(q.scales(0) == 1f)
    val d = q.decode(q.encode(Array(0.25f, 0.33f)))
    assert(d(0) == 0.25f)
  }

  test("binarizer decode reconstructs each value's bucket weight") {
    (1 to 100).foreach { _ =>
      val dim = Seq(16, 32, 64)(rnd.nextInt(3))
      val nbits = 1 + rnd.nextInt(2)
      val b = Binarizer.train(vec(dim), nbits)
      val v = vec(dim)
      val decoded = b.decode(b.encode(v))
      v.zip(decoded).foreach { case (x, d) =>
        assert(d == b.bucketWeights(b.bucketize(x)),
          s"value $x decoded to $d, bucket ${b.bucketize(x)}")
      }
    }
  }

  test("binarizer code size is dim/8*nbits and encode is deterministic") {
    for (dim <- Seq(16, 32, 64); nbits <- Seq(1, 2)) {
      val b = Binarizer.train(Array.tabulate(dim)(i => i * 0.1f - dim * 0.05f), nbits)
      assert(b.codeSize == dim / 8 * nbits)
      val v = Array.tabulate(dim)(i => math.sin(i.toDouble).toFloat)
      assert(b.encode(v).toSeq == b.encode(v).toSeq)
    }
  }

  test("binarizer bit packing is big-endian within bytes, LSB-first per value") {
    // dim 8, nbits 1: value i below the single cutoff -> bit 0; the stream
    // packs bit i of the 8-value block into bit (7-i) of the byte
    // (Binarizer.cpp:234-274 parity)
    val b = Binarizer(Array(0.0f), Array(-1.0f, 1.0f), 0f, 1, 8)
    val v = Array[Float](1, -1, -1, -1, -1, -1, -1, -1) // only value 0 is bucket 1
    assert(b.encode(v).toSeq == Seq(0x80.toByte))
    val v2 = Array[Float](-1, -1, -1, -1, -1, -1, -1, 1)
    assert(b.encode(v2).toSeq == Seq(0x01.toByte))
    // nbits=2 (dim must be a multiple of 16): bucket 2 (= binary 10) of
    // value 0 -> stream bits (0,1)=(0,1) -> byte bit pattern 0100_0000
    val b2 = Binarizer(Array(-0.5f, 0.0f, 0.5f), Array(-1f, -0.25f, 0.25f, 1f), 0f, 2, 16)
    val v3 = Array.fill(16)(-1f); v3(0) = 0.3f // bucket 2, all others bucket 0
    assert((b2.encode(v3)(0) & 0xFF) == 0x40)
  }

  test("binarizer save/load round-trips the model") {
    for (dim <- Seq(16, 32); nbits <- Seq(1, 2)) {
      val b = Binarizer.train(Array.tabulate(dim)(i => i * 0.07f - 1f), nbits)
      val path = java.nio.file.Files.createTempFile("binarizer", ".json").toString
      b.save(path)
      val l = Binarizer.load(path)
      assert(l.bucketCutoffs.toSeq == b.bucketCutoffs.toSeq)
      assert(l.bucketWeights.toSeq == b.bucketWeights.toSeq)
      assert(l.avgResidual == b.avgResidual && l.nbits == b.nbits && l.dim == b.dim)
    }
  }

  test("PQ decode is idempotent (codebook centroids are fixed points)") {
    val dim = 16
    val train = Array.fill(64)(vec(dim))
    val pe = ProductEncoder.train(train, m = 4)
    (1 to 100).foreach { _ =>
      val v = vec(dim)
      val decoded = pe.decode(pe.encode(v))
      assert(decoded.length == dim)
      assert(pe.decode(pe.encode(decoded)).toSeq == decoded.toSeq)
    }
  }
}
