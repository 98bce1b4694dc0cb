package graft.quantizers

import graft.core.Json

/** Product quantizer codec (reference: lintdb/quantizers/ProductEncoder.cpp
  * — a wrapper over faiss::IndexPQ with IP metric). Semantics re-implemented:
  * the vector is split into `m` subspaces of dim/m; each subspace has its own
  * codebook of 2^nbits codewords learned by Lloyd's k-means; encoding stores
  * the nearest (L2) codeword id per subspace (faiss PQ assigns by L2 even
  * under an IP index metric); decoding concatenates codewords.
  *
  * Only nbits=8 (byte codes, 256 codewords) is supported: code_size = m.
  */
final case class ProductEncoder(
    codebooks: Array[Array[Array[Float]]], // (m, K, dsub)
    dim: Int) extends Quantizer {
  val kind = "PRODUCT_ENCODER"
  val m: Int = codebooks.length
  val dsub: Int = dim / m
  val codeSize: Int = m
  require(dim % m == 0, s"dim $dim must divide into $m subspaces")

  def encode(vec: Array[Float]): Array[Byte] = {
    val code = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      var best = 0
      var bestDist = Float.MaxValue
      var k = 0
      while (k < book.length) {
        var d = 0.0f
        var i = 0
        while (i < dsub) {
          val diff = vec(s * dsub + i) - book(k)(i)
          d += diff * diff
          i += 1
        }
        if (d < bestDist) { bestDist = d; best = k }
        k += 1
      }
      code(s) = best.toByte
      s += 1
    }
    code
  }

  def decode(code: Array[Byte]): Array[Float] = {
    val out = new Array[Float](dim)
    var s = 0
    while (s < m) {
      val word = codebooks(s)(code(s) & 0xFF)
      System.arraycopy(word, 0, out, s * dsub, dsub)
      s += 1
    }
    out
  }

  def save(path: String): Unit = Json.write(path, Map(
    "dim" -> dim,
    "codebooks" -> codebooks.map(_.map(_.toSeq).toSeq).toSeq))
}

object ProductEncoder {

  /** Train per-subspace codebooks with Lloyd's k-means on a (small) sample —
    * the reference trains its PQ on a sqrt-subsample of residuals
    * (lintdb/index.cpp:260-307), which stays driver-sized even at large n;
    * the big distributed jobs are coarse k-means and encoding, not this. */
  def train(sample: Array[Array[Float]], m: Int, nbits: Int = 8,
      iters: Int = 25, seed: Long = 42L): ProductEncoder = {
    require(nbits == 8, "only nbits=8 (byte codes) supported")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must be a multiple of m=$m")
    val dsub = dim / m
    val rnd = new scala.util.Random(seed)
    val books = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      lloyd(sub, math.min(1 << nbits, sub.length), iters, rnd)
    }
    ProductEncoder(books, dim)
  }

  /** plain Lloyd's: seeded sample init, mean update, dead centroids
    * re-seeded from random points. */
  private def lloyd(points: Array[Array[Float]], k: Int, iters: Int,
      rnd: scala.util.Random): Array[Array[Float]] = {
    val dsub = points.head.length
    val cents = rnd.shuffle(points.indices.toList).take(k)
      .map(i => points(i).clone()).toArray
    val assign = new Array[Int](points.length)
    for (_ <- 0 until iters) {
      var p = 0
      while (p < points.length) {
        var best = 0; var bestDist = Float.MaxValue; var c = 0
        while (c < cents.length) {
          var d = 0.0f; var i = 0
          while (i < dsub) { val t = points(p)(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bestDist) { bestDist = d; best = c }
          c += 1
        }
        assign(p) = best
        p += 1
      }
      val sums = Array.fill(cents.length)(new Array[Float](dsub))
      val counts = new Array[Int](cents.length)
      p = 0
      while (p < points.length) {
        val c = assign(p); counts(c) += 1
        var i = 0
        while (i < dsub) { sums(c)(i) += points(p)(i); i += 1 }
        p += 1
      }
      var c = 0
      while (c < cents.length) {
        if (counts(c) == 0) cents(c) = points(rnd.nextInt(points.length)).clone()
        else {
          var i = 0
          while (i < dsub) { cents(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
    }
    cents
  }

  def load(path: String): ProductEncoder = {
    val mp = Json.read(path, classOf[Map[String, Any]])
    val books = mp("codebooks").asInstanceOf[Seq[Any]].map(
      _.asInstanceOf[Seq[Any]].map(
        _.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Number].floatValue()).toArray
      ).toArray).toArray
    ProductEncoder(books, mp("dim").asInstanceOf[Number].intValue())
  }
}
