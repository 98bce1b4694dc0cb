package graft.quantizers

import graft.core.Json

/** Residual codec interface (reference: lintdb/quantizers/Quantizer.h:28-41).
  * Pure Scala; `encode`/`decode` run inside executor-side functions over
  * token vectors, so implementations must be serializable and allocation-light.
  */
trait Quantizer extends Serializable {
  def kind: String
  def codeSize: Int
  def dim: Int
  /** one token vector -> codeSize bytes. */
  def encode(vec: Array[Float]): Array[Byte]
  /** codeSize bytes -> one reconstructed token vector. */
  def decode(code: Array[Byte]): Array[Float]
}

/** Pass-through codec (QuantizerType.NONE; reference:
  * lintdb/quantizers/IdentityQuantizer.cpp): float32 little-endian bytes. */
final case class IdentityQuantizer(dim: Int) extends Quantizer {
  val kind = "NONE"
  val codeSize: Int = dim * 4
  def encode(vec: Array[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(codeSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asFloatBuffer().put(vec)
    bb.array()
  }
  def decode(code: Array[Byte]): Array[Float] = {
    val out = new Array[Float](dim)
    java.nio.ByteBuffer.wrap(code).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asFloatBuffer().get(out)
    out
  }
}

/** PLAID-style bit-level residual codec. Re-implementation of the semantics
  * of the reference's Binarizer (lintdb/quantizers/Binarizer.cpp):
  *
  *  - train (Binarizer.cpp:60-85 + calculate_quantiles :186-231): from the
  *    per-dimension AVERAGE residual vector, take the 2^nbits uniform
  *    quantiles of its sorted values; cutoffs are quantiles 1..2^nbits-1,
  *    weights are quantiles 0..2^nbits-1; scalar avg_residual is the signed
  *    mean of the per-dim averages (train() overrides calculate_quantiles'
  *    abs-mean with total_avg, Binarizer.cpp:75-82).
  *  - bucketize (:276-309): value -> first cutoff it is below, else last
  *    bucket; bucket bits are emitted LSB-first per value.
  *  - packbits (:234-274): the bitstream packs big-endian within each byte
  *    (bit i of the stream -> bit (7 - i%8) of byte i/8) — byte-compatible
  *    with the reference's stored codes.
  *  - decode (:347-382): reconstruct each value's bucket and emit
  *    bucket_weights[bucket] (the reverse-bitmap + LUT there is a lookup
  *    optimization of exactly this).
  *
  * code_size = dim/8 * nbits (Binarizer.cpp:384-386).
  */
final case class Binarizer(
    bucketCutoffs: Array[Float],
    bucketWeights: Array[Float],
    avgResidual: Float,
    nbits: Int,
    dim: Int) extends Quantizer {
  require(dim % 8 == 0, s"dim must be a multiple of 8, got $dim")
  require(dim % (nbits * 8) == 0, s"dim must be a multiple of ${nbits * 8}")
  val kind = "BINARIZER"
  val codeSize: Int = dim / 8 * nbits

  def bucketize(v: Float): Int = {
    var j = 0
    while (j < bucketCutoffs.length) {
      if (v < bucketCutoffs(j)) return j
      j += 1
    }
    bucketCutoffs.length
  }

  def encode(vec: Array[Float]): Array[Byte] = {
    val packed = new Array[Byte](codeSize)
    var i = 0
    while (i < dim) {
      val bucket = bucketize(vec(i))
      var j = 0
      while (j < nbits) {
        val bit = (bucket >> j) & 1 // LSB-first per value
        if (bit == 1) {
          val streamIdx = i * nbits + j
          packed(streamIdx / 8) = (packed(streamIdx / 8) | (1 << (7 - streamIdx % 8))).toByte
        }
        j += 1
      }
      i += 1
    }
    packed
  }

  def decode(code: Array[Byte]): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var bucket = 0
      var j = 0
      while (j < nbits) {
        val streamIdx = i * nbits + j
        val bit = (code(streamIdx / 8) >> (7 - streamIdx % 8)) & 1
        bucket |= bit << j
        j += 1
      }
      out(i) = bucketWeights(bucket)
      i += 1
    }
    out
  }

  def save(path: String): Unit = Json.write(path, Map(
    "bucket_cutoffs" -> bucketCutoffs.toSeq,
    "bucket_weights" -> bucketWeights.toSeq,
    "avg_residual" -> avgResidual,
    "nbits" -> nbits,
    "dim" -> dim))
}

/** 8-bit per-dimension scalar codec — the faiss ScalarQuantizer QT_8bit
  * design (public knowledge; a graft extension beyond the reference's
  * codec set). Per-dim trained affine range [min_i, min_i + 255*scale_i]:
  *
  *  - encode: q_i = clamp(floor((v_i - min_i) / scale_i + 0.5), 0, 255),
  *    ONE byte per dimension (codeSize = dim, 4x smaller than identity);
  *  - decode: min_i + q_i * scale_i (max reconstruction error scale_i/2).
  *
  * All arithmetic is f32 in a FIXED op order (sub, div, add, floor; then
  * mul, add), so decode(encode(v)) is bit-reproducible cross-engine — the
  * engine oracle twin re-derives exactly this chain in DuckDB FLOAT with
  * dyadic preset ranges. A constant dimension (max == min) trains
  * scale = 1 so every value encodes to 0 and decodes to min exactly. */
final case class ScalarQuantizer8(
    mins: Array[Float],
    scales: Array[Float],
    dim: Int) extends Quantizer {
  require(mins.length == dim && scales.length == dim,
    s"per-dim arrays must have length $dim")
  require(scales.forall(_ > 0f), "scales must be positive")
  val kind = "SQ8"
  val codeSize: Int = dim

  def encode(vec: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](dim)
    var i = 0
    while (i < dim) {
      val x = (vec(i) - mins(i)) / scales(i) + 0.5f
      val q = math.floor(x.toDouble).toInt // f32 -> double promotion is exact
      out(i) = (if (q < 0) 0 else if (q > 255) 255 else q).toByte
      i += 1
    }
    out
  }

  def decode(code: Array[Byte]): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      out(i) = mins(i) + (code(i) & 0xFF).toFloat * scales(i)
      i += 1
    }
    out
  }

  def save(path: String): Unit = Json.write(path, Map(
    "mins" -> mins.toSeq,
    "scales" -> scales.toSeq,
    "dim" -> dim))
}

object ScalarQuantizer8 {

  /** Train from per-dimension (min, max) over the residual sample (the
    * distributed job reduces to two dim-length vectors — same shape as the
    * binarizer's average-residual reduction). */
  def train(mins: Array[Float], maxs: Array[Float]): ScalarQuantizer8 = {
    val dim = mins.length
    require(maxs.length == dim, "min/max length mismatch")
    val scales = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val range = maxs(i) - mins(i)
      scales(i) = if (range > 0f) range / 255f else 1f
      i += 1
    }
    ScalarQuantizer8(mins.clone(), scales, dim)
  }

  def load(path: String): ScalarQuantizer8 = {
    val m = Json.read(path, classOf[Map[String, Any]])
    def floats(k: String) = m(k).asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Number].floatValue()).toArray
    ScalarQuantizer8(floats("mins"), floats("scales"),
      m("dim").asInstanceOf[Number].intValue())
  }
}

object Binarizer {

  /** Train from the per-dimension average residual vector (the distributed
    * job reduces residuals to this dim-length vector; quantiles are then a
    * driver-side sort — reference Binarizer.cpp:60-85, 186-231). */
  def train(perDimAvgResidual: Array[Float], nbits: Int): Binarizer = {
    val dim = perDimAvgResidual.length
    val numOptions = 1 << nbits
    val sorted = perDimAvgResidual.sorted
    def quantile(q: Double): Float = sorted(math.min((q * dim).toInt, dim - 1))
    val quantiles = (0 until numOptions).map(_.toDouble / numOptions)
    val cutoffs = quantiles.tail.map(quantile).toArray
    val weights = quantiles.map(quantile).toArray
    // the reference's train() overrides calculate_quantiles' abs-mean with
    // the SIGNED mean (total_avg, Binarizer.cpp:75-82) — keep that for
    // saved-model parity
    val avg = perDimAvgResidual.sum / dim
    Binarizer(cutoffs, weights, avg, nbits, dim)
  }

  def load(path: String): Binarizer = {
    val m = Json.read(path, classOf[Map[String, Any]])
    def floats(k: String) = m(k).asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Number].floatValue()).toArray
    Binarizer(floats("bucket_cutoffs"), floats("bucket_weights"),
      m("avg_residual").asInstanceOf[Number].floatValue(),
      m("nbits").asInstanceOf[Number].intValue(),
      m("dim").asInstanceOf[Number].intValue())
  }
}
