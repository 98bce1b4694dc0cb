package graft.quantizers

import graft.core.Json
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF coarse quantizer: a flat centroid matrix with inner-product argmax
  * assignment (reference: lintdb/quantizers/CoarseQuantizer.cpp:9-258 and
  * the Faiss-backed twin at :260-352 — both are exhaustive IP argmax over
  * the centroid matrix; only training differs).
  *
  * Training uses MLlib KMeans (Lloyd's, Euclidean). The reference trains
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

  /** Train k-means over a DataFrame with a `vec: array<float>` column of
    * token embeddings (reference train: lintdb/index.cpp:250-254). Runs as
    * an MLlib job — scales out; fixed seed for determinism. */
  def train(tokens: DataFrame, numCentroids: Int, numIterations: Int,
      seed: Long = 42L): CoarseQuantizer = {
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val df = tokens.select(toVec(col("vec")).as("features"))
    val model = new KMeans()
      .setK(numCentroids)
      .setMaxIter(numIterations)
      .setSeed(seed)
      .setInitMode("random") // faiss kmeans seeds from random samples too;
                             // k-means|| costs several extra passes
      .setFeaturesCol("features")
      .fit(df)
    new CoarseQuantizer(model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  def load(path: String): CoarseQuantizer = {
    val m = Json.read(path, classOf[Map[String, Any]])
    val cents = m("centroids").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Number].floatValue()).toArray)
      .toArray
    new CoarseQuantizer(cents)
  }
}
