package graft

import graft.quantizers.{Binarizer, IdentityQuantizer}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's binarizer tests (tests/binarizer_test.cpp) plus
  * seeded-random property tests for the pure codec functions (SURVEY §5). */
class BinarizerSpec extends AnyFunSuite {

  test("train computes uniform quantile cutoffs and weights") {
    // per-dim averages 0..15 -> sorted identity; nbits=2 -> 4 buckets
    val avg = Array.tabulate(16)(_.toFloat)
    val b = Binarizer.train(avg, nbits = 2)
    // quantiles 1/4, 2/4, 3/4 of 16 values -> indices 4, 8, 12
    assert(b.bucketCutoffs.toSeq == Seq(4.0f, 8.0f, 12.0f))
    // weights at quantiles 0, 1/4, 2/4, 3/4 -> indices 0, 4, 8, 12
    assert(b.bucketWeights.toSeq == Seq(0.0f, 4.0f, 8.0f, 12.0f))
    // signed mean — the reference's train() overrides the abs-mean with
    // total_avg (Binarizer.cpp:75-82)
    assert(b.avgResidual == avg.sum / 16)
  }

  test("bucketize: first cutoff above value, overflow to last bucket") {
    val b = Binarizer(Array(0.0f, 1.0f, 2.0f), Array(-1.0f, 0.5f, 1.5f, 2.5f), 0f, 2, 16)
    assert(b.bucketize(-5f) == 0)
    assert(b.bucketize(0.5f) == 1)
    assert(b.bucketize(1.5f) == 2)
    assert(b.bucketize(99f) == 3)
  }

  test("bit layout: nbits=1 packs big-endian within byte") {
    // dim=8, cutoff at 0 -> negative=bucket0, positive=bucket1
    val b = Binarizer(Array(0.0f), Array(-1.0f, 1.0f), 0f, 1, 8)
    // only dim 0 positive -> stream bit 0 set -> byte bit 7 (big-endian)
    val code = b.encode(Array(1f, -1f, -1f, -1f, -1f, -1f, -1f, -1f))
    assert(code.length == 1 && (code(0) & 0xFF) == 0x80)
    // only dim 7 positive -> byte bit 0
    val code2 = b.encode(Array(-1f, -1f, -1f, -1f, -1f, -1f, -1f, 1f))
    assert((code2(0) & 0xFF) == 0x01)
  }

  test("code size = dim/8*nbits (reference Binarizer.cpp:384-386)") {
    assert(Binarizer(Array(0f), Array(-1f, 1f), 0f, 1, 128).codeSize == 16)
    assert(Binarizer(Array.fill(3)(0f), Array.fill(4)(0f), 0f, 2, 128).codeSize == 32)
  }

  test("property: decode(encode(v)) == weight of v's bucket, all nbits") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200; nbits <- Seq(1, 2, 4)) {
      val dim = 32
      val buckets = 1 << nbits
      val cutoffs = Array.tabulate(buckets - 1)(i => -5f + 10f * (i + 1) / buckets)
      val weights = Array.tabulate(buckets)(i => -5f + 10f * (i + 0.5f) / buckets)
      val b = Binarizer(cutoffs, weights, 0f, nbits, dim)
      val v = Array.fill(dim)(rnd.nextFloat() * 20f - 10f)
      val decoded = b.decode(b.encode(v))
      val expected = v.map(x => weights(b.bucketize(x)))
      assert(decoded.toSeq == expected.toSeq, s"nbits=$nbits")
    }
  }

  test("property: identity quantizer round-trips exactly") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val v = Array.fill(16)(rnd.nextFloat() * 200f - 100f)
      val q = IdentityQuantizer(16)
      assert(q.decode(q.encode(v)).toSeq == v.toSeq)
    }
  }

  test("save/load round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("binarizer").toString
    val b = Binarizer.train(Array.tabulate(64)(i => (i - 32).toFloat / 7f), 2)
    b.save(s"$dir/b.json")
    val loaded = Binarizer.load(s"$dir/b.json")
    assert(loaded == b.copy(
      bucketCutoffs = loaded.bucketCutoffs, bucketWeights = loaded.bucketWeights)
      && loaded.bucketCutoffs.toSeq == b.bucketCutoffs.toSeq
      && loaded.bucketWeights.toSeq == b.bucketWeights.toSeq)
  }
}
