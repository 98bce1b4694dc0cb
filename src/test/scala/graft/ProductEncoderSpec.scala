package graft

import graft.quantizers.ProductEncoder
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's PQ tests (tests/product_quantizer_test.cpp):
  * codebook shapes, deterministic round-trip, reconstruction error bound. */
class ProductEncoderSpec extends AnyFunSuite {

  val dim = 16
  val rnd = new scala.util.Random(42)
  // clustered sample: 4 latent modes + noise, so PQ has structure to learn
  val modes = Array.fill(4)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  val sample: Array[Array[Float]] = Array.tabulate(400) { i =>
    val m = modes(i % 4)
    m.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
  }

  test("codebook shape (m, <=256, dim/m) and code size = m") {
    val pe = ProductEncoder.train(sample, m = 4)
    assert(pe.m == 4 && pe.dsub == 4 && pe.codeSize == 4)
    assert(pe.codebooks.forall(_.forall(_.length == 4)))
    assert(pe.codebooks.forall(_.length <= 256))
  }

  test("encode/decode reconstructs near the input for in-distribution data") {
    val pe = ProductEncoder.train(sample, m = 4)
    val errs = sample.take(50).map { v =>
      val rec = pe.decode(pe.encode(v))
      math.sqrt(v.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum.toDouble)
    }
    val meanErr = errs.sum / errs.length
    val meanNorm = sample.take(50).map(v =>
      math.sqrt(v.map(x => x * x).sum.toDouble)).sum / 50
    assert(meanErr < meanNorm * 0.5, s"mean err $meanErr vs norm $meanNorm")
  }

  test("deterministic: same seed, same codebooks, same codes") {
    val a = ProductEncoder.train(sample, m = 4)
    val b = ProductEncoder.train(sample, m = 4)
    assert(a.codebooks.flatten.flatten.toSeq == b.codebooks.flatten.flatten.toSeq)
    assert(a.encode(sample(0)).toSeq == b.encode(sample(0)).toSeq)
  }

  test("save/load round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString
    val pe = ProductEncoder.train(sample, m = 4)
    pe.save(s"$dir/pq.json")
    val loaded = ProductEncoder.load(s"$dir/pq.json")
    assert(loaded.dim == pe.dim && loaded.m == pe.m)
    assert(loaded.perm.toSeq == pe.perm.toSeq)
    assert(loaded.encode(sample(1)).toSeq == pe.encode(sample(1)).toSeq)
    assert(loaded.decode(pe.encode(sample(1))).toSeq == pe.decode(pe.encode(sample(1))).toSeq)
  }

  test("load without a perm field defaults to identity (pre-r11 JSON)") {
    val dir = java.nio.file.Files.createTempDirectory("pq_old").toString
    val pe = ProductEncoder.train(sample, m = 4, balance = false)
    // strip the perm key the way an old save would have written it
    graft.core.Json.write(s"$dir/pq.json", Map(
      "dim" -> pe.dim,
      "codebooks" -> pe.codebooks.map(_.map(_.toSeq).toSeq).toSeq))
    val loaded = ProductEncoder.load(s"$dir/pq.json")
    assert(loaded.perm.toSeq == (0 until dim))
    assert(loaded.encode(sample(2)).toSeq == pe.encode(sample(2)).toSeq)
  }

  def mse(pe: ProductEncoder, vs: Array[Array[Float]]): Double =
    vs.map { v =>
      val rec = pe.decode(pe.encode(v))
      v.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum.toDouble
    }.sum / vs.length

  test("variance-balanced perm beats the contiguous split on skewed data") {
    // adversarial-for-classic layout: the high-variance dims all land in the
    // FIRST subspaces of the contiguous split (variance ~ 1/(j+1)), so one
    // codebook must spend its 2^nbits codewords on several hot dims while
    // later codebooks quantize near-constants. Balancing spreads the hot
    // dims one-per-subspace.
    val rnd2 = new scala.util.Random(7)
    val skewed = Array.fill(600)(Array.tabulate(dim) { j =>
      ((rnd2.nextFloat() * 2f - 1f) / (j + 1)).toFloat
    })
    val classic = ProductEncoder.train(skewed, m = 4, balance = false)
    val balanced = ProductEncoder.train(skewed, m = 4)
    val (mc, mb) = (mse(classic, skewed), mse(balanced, skewed))
    assert(mb < mc * 0.8, s"balanced mse $mb vs classic $mc — expected >20% win")
    // and the perm really is balanced: each subspace gets exactly one of the
    // four highest-variance dims (0,1,2,3) under the 1/(j+1) profile
    val groups = balanced.perm.grouped(balanced.dsub).toSeq
    assert(groups.forall(g => g.count(_ < 4) == 1), groups.map(_.toSeq).toString)
  }
}
