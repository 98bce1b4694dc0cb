package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * step a large-scale embedding pipeline runs before IVF/LSH indexing
  * (project 768-dim model outputs to 64-128 dims, whiten, then cluster:
  * smaller codes, faster scans, better-conditioned k-means). The reference
  * engine has no PCA (its quantizers consume raw model embeddings); this is
  * part of the training-data-pipeline superset, built Spark-first:
  *
  *  - [[moments]]: ONE pass over the corpus, no shuffle — per-partition
  *    primitive accumulators of (count, sum_i, sum of upper-triangle
  *    products), collected as (partitionId, accumulator) and merged on the
  *    driver in ascending-partition order. Double addition does not
  *    reassociate freely, so the fixed merge order (the same discipline as
  *    CoarseQuantizer.trainDistributed) makes the result bit-deterministic
  *    for a fixed input partitioning. Driver state is O(d^2), independent
  *    of corpus size.
  *  - [[symEigen]]: cyclic Jacobi on the d x d covariance — O(d^3) per
  *    sweep, driver-local (d <= a few thousand), deterministic rotation
  *    order, eigenpairs sorted by eigenvalue descending with a canonical
  *    sign (largest-|entry| coordinate positive) so components never flip
  *    between runs.
  *  - [[PcaModel.project]]: broadcast the k x d component matrix, one
  *    narrow map per row (k dot products against the centered vector) — no
  *    shuffle, no driver collect; the 100 TB projection is embarrassingly
  *    parallel.
  */
object Pca {

  /** (rowCount, sums[d], upperTriProducts[d*(d+1)/2]) — products stored
    * row-major upper triangle: index(i,j) for i <= j. */
  final case class Moments(n: Long, sums: Array[Double], products: Array[Double]) {
    def dim: Int = sums.length

    /** Sample covariance matrix (divides by n-1). */
    def covariance: Array[Array[Double]] = {
      val d = dim
      val c = Array.ofDim[Double](d, d)
      var idx = 0
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val cov = (products(idx) - sums(i) * sums(j) / n) / (n - 1)
          c(i)(j) = cov
          c(j)(i) = cov
          idx += 1
          j += 1
        }
        i += 1
      }
      c
    }

    def mean: Array[Double] = sums.map(_ / n)
  }

  /** One-pass second-moment accumulation over `df`'s `embCol`
    * (array<double>) — see object scaladoc for the determinism contract. */
  def moments(df: DataFrame, embCol: String, dim: Int): Moments = {
    val tri = dim * (dim + 1) / 2
    val partials: Array[(Int, (Long, Array[Double], Array[Double]))] =
      df.select(col(embCol)).rdd.mapPartitionsWithIndex { (pid, rows) =>
        val sums = new Array[Double](dim)
        val prods = new Array[Double](tri)
        var n = 0L
        rows.foreach { r =>
          val v = r.getSeq[Double](0)
          require(v.length == dim, s"embedding has dim ${v.length}, expected $dim")
          val a = v.toArray
          var idx = 0
          var i = 0
          while (i < dim) {
            sums(i) += a(i)
            var j = i
            while (j < dim) { prods(idx) += a(i) * a(j); idx += 1; j += 1 }
            i += 1
          }
          n += 1
        }
        Iterator.single((pid, (n, sums, prods)))
        // bounded: Iterator.single above emits exactly one moments row per
        // partition, so the driver receives numPartitions rows
      }.collect()
    val sums = new Array[Double](dim)
    val prods = new Array[Double](tri)
    var n = 0L
    partials.sortBy(_._1).foreach { case (_, (pn, ps, pp)) =>
      n += pn
      var i = 0
      while (i < dim) { sums(i) += ps(i); i += 1 }
      var k = 0
      while (k < tri) { prods(k) += pp(k); k += 1 }
    }
    require(n > 1, "PCA needs at least 2 rows")
    Moments(n, sums, prods)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix. Returns eigenvalues
    * (descending) and matching eigenvectors (one per row), sign-canonical:
    * each vector's largest-|entry| coordinate is positive (first such index
    * on ties), so the basis is unique up to eigenvalue ties. */
  def symEigen(mat: Array[Array[Double]], maxSweeps: Int = 100,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = mat.length
    val a = mat.map(_.clone())
    // eigenvector accumulator, starts as identity
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      math.sqrt(2 * s)
    }
    val scale = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = 0; while (j < d) { s = math.max(s, math.abs(a(i)(j))); j += 1 }; i += 1 }
      math.max(s, 1e-300)
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm() > tol * scale * d) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            // rotate rows/cols p,q of a
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            // accumulate rotation into v (columns are eigenvectors)
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val pairs = (0 until d).map { i =>
      val vec = Array.tabulate(d)(k => v(k)(i))
      // canonical sign: largest-|entry| coordinate positive
      var best = 0
      var k = 1
      while (k < d) { if (math.abs(vec(k)) > math.abs(vec(best))) best = k; k += 1 }
      val flipped = if (vec(best) < 0) vec.map(-_) else vec
      (a(i)(i), flipped)
    }.sortBy { case (ev, _) => -ev }
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** Fitted model: mean vector + top-k components (rows, orthonormal) +
    * their eigenvalues (explained variance per component). */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {

    /** Whitened variant: components scaled by 1/sqrt(eigenvalue), so every
      * projected coordinate has unit sample variance — the usual prep
      * before isotropic quantizers (PQ subspaces assume comparable energy
      * per dim; see ProductEncoder's variance-balancing permutation for
      * the rotation-free sibling). Components with eigenvalue <= eps are
      * left unscaled (a degenerate direction carries no signal to
      * equalize, and 1/sqrt(~0) would explode noise). */
    def whiten(eps: Double = 1e-12): PcaModel = copy(
      components = components.zip(eigenvalues).map { case (row, ev) =>
        if (ev > eps) { val s = 1.0 / math.sqrt(ev); row.map(_ * s) } else row
      })

    /** Project `embCol` (array<double>) onto the components: one narrow
      * map (k dot products per row against a broadcast k x d matrix),
      * appending `outCol` as array<double> of length k. */
    def project(df: DataFrame, embCol: String, outCol: String): DataFrame = {
      val spark = df.sparkSession
      val bc = spark.sparkContext.broadcast((mean, components))
      val proj = udf { (v: Seq[Double]) =>
        val (m, comp) = bc.value
        val d = m.length
        require(v.length == d, s"embedding has dim ${v.length}, expected $d")
        val centered = new Array[Double](d)
        var i = 0
        while (i < d) { centered(i) = v(i) - m(i); i += 1 }
        comp.map { row =>
          var s = 0.0
          var j = 0
          while (j < d) { s += row(j) * centered(j); j += 1 }
          s
        }.toSeq
      }
      df.withColumn(outCol, proj(col(embCol)))
    }
  }

  /** Fit top-k PCA: one distributed moments pass + driver-local Jacobi. */
  def fit(df: DataFrame, embCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k=$k out of range 1..$dim")
    val m = moments(df, embCol, dim)
    val (evals, evecs) = symEigen(m.covariance)
    PcaModel(m.mean, evecs.take(k), evals.take(k))
  }
}
