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

  private def ip(a: Array[Float], b: Array[Float]): Float = {
    var s = 0.0f; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** argmax inner product; deterministic tie-break = lowest centroid id. */
  def assign(vec: Array[Float]): Int = {
    var best = 0; var bestScore = Float.NegativeInfinity; var c = 0
    while (c < centroids.length) {
      val s = ip(vec, centroids(c))
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  /** all centroid scores for one vector (inner products). */
  def scoreAll(vec: Array[Float]): Array[Float] = {
    val out = new Array[Float](numCentroids)
    var c = 0
    while (c < numCentroids) { out(c) = ip(vec, centroids(c)); c += 1 }
    out
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

  /** Max training points per centroid — the Faiss Clustering default
    * (max_points_per_centroid = 256): coarse-quantizer k-means is always
    * trained on a bounded subsample, never the full corpus, because centroid
    * quality saturates long before that and full-corpus Lloyd's at 100 TB
    * would be all shuffle for no gain. The reference inherits exactly this
    * behavior through faiss::Clustering (lintdb/quantizers/impl/kmeans.cpp). */
  val MaxPointsPerCentroid = 256

  /** Train k-means over a DataFrame with a `vec: array<float>` column of
    * token embeddings (reference train: lintdb/index.cpp:250-254).
    *
    * Distributed work is ONE pass: a seeded uniform sample of at most
    * `numCentroids * MaxPointsPerCentroid` vectors is collected (a few MB at
    * any corpus size), then Lloyd's runs driver-local on primitive arrays —
    * the same shape as the reference's Faiss training, where clustering also
    * happens in-process on a subsample. Assignment (the per-token argmax
    * that touches all data) stays distributed via the broadcast
    * [[CoarseQuantizer]]. Fixed seed for determinism. */
  def train(tokens: DataFrame, numCentroids: Int, numIterations: Int,
      seed: Long = 42L): CoarseQuantizer = {
    val maxSample = numCentroids.toLong * MaxPointsPerCentroid
    // optimistic single job: if the corpus fits the sample budget, one
    // bounded collect IS the sample (no count needed); only a larger corpus
    // pays for the count + uniform-sample pass
    val probe = tokens.select(col("vec")).limit(maxSample.toInt + 1).collect()
    val points =
      if (probe.length <= maxSample) probe.map(_.getAs[scala.collection.Seq[Float]](0).toArray)
      else {
        // corpus exceeds the budget: a limit() would be partition-biased, so
        // take a seeded uniform sample instead
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

  /** Driver-local Lloyd's iterations, Euclidean assignment (argmin-L2 ==
    * argmax-IP on L2-normalized embeddings — see class doc). Init = seeded
    * random distinct samples, matching Faiss's random-sample init; empty
    * clusters are re-seeded from a random point (Faiss splits clusters —
    * same effect: no dead centroids). */
  private def lloyd(points: Array[Array[Float]], k: Int, iters: Int,
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
