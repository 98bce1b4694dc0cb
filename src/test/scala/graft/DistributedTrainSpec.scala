package graft

import graft.quantizers.CoarseQuantizer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed-sample coarse trainer
  * ([[CoarseQuantizer.trainDistributed]] — the production-K path that keeps
  * the K·256-vector sample off the driver):
  *
  *   - layout independence: bit-identical centroids whatever the input's
  *     split layout (the content-hash canonicalization is the mechanism);
  *   - quality parity with the driver-local trainer (same decision kernel,
  *     different summation order — so equal-quality clustering, not
  *     bit-equal centroids);
  *   - the conf-budget dispatch inside [[CoarseQuantizer.train]];
  *   - degenerate shapes (k > n padding, emptied-cluster reseed).
  */
class DistributedTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** n deterministic points around `blobs` well-separated centers. */
  private def blobData(n: Int, dim: Int, blobs: Int, seed: Long): Seq[Seq[Float]] = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { i =>
      val b = i % blobs
      (0 until dim).map(d =>
        (if (d % blobs == b) 10f else 0f) + rnd.nextGaussian().toFloat * 0.05f)
    }
  }

  private def df(pts: Seq[Seq[Float]], parts: Int) =
    pts.toDF("vec").repartition(parts)

  private def sqError(pts: Seq[Seq[Float]], q: CoarseQuantizer): Double =
    pts.map { p =>
      val v = p.toArray
      val c = q.centroids(q.assign(v))
      v.indices.map(i => (v(i) - c(i)).toDouble * (v(i) - c(i))).sum
    }.sum / pts.length

  test("bit-identical centroids across input split layouts") {
    val pts = blobData(2000, 12, 4, seed = 1)
    val a = CoarseQuantizer.trainDistributed(df(pts, 3), 16, 3, seed = 42L)
    val b = CoarseQuantizer.trainDistributed(df(pts, 7), 16, 3, seed = 42L)
    assert(a.centroids.length == 16 && b.centroids.length == 16)
    a.centroids.indices.foreach { i =>
      assert(java.util.Arrays.equals(a.centroids(i), b.centroids(i)),
        s"centroid $i differs between split layouts")
    }
  }

  test("quality parity with the driver-local trainer") {
    val pts = blobData(3000, 12, 4, seed = 2)
    val local = CoarseQuantizer.train(df(pts, 4), 16, 4)
    val dist = CoarseQuantizer.trainDistributed(df(pts, 4), 16, 4)
    val (eL, eD) = (sqError(pts, local), sqError(pts, dist))
    // same decision kernel, same sample bound, different init/summation
    // order: clustering quality must match, centroid bits need not
    assert(eD <= eL * 1.10 + 1e-9, s"distributed error $eD vs local $eL")
    assert(eL <= eD * 1.10 + 1e-9, s"local error $eL vs distributed $eD")
  }

  test("train() dispatches to the distributed path above the conf budget") {
    val pts = blobData(800, 8, 4, seed = 3)
    val key = CoarseQuantizer.MaxLocalSampleBytesKey
    val prior = spark.conf.getOption(key)
    try {
      // 16 centroids x 256 x dim 8 x 4B = 128 KiB estimate; 1 KiB budget
      // forces the dispatch — result must be exactly the distributed one
      spark.conf.set(key, "1024")
      val viaTrain = CoarseQuantizer.train(df(pts, 5), 16, 2)
      val direct = CoarseQuantizer.trainDistributed(df(pts, 5), 16, 2)
      viaTrain.centroids.indices.foreach { i =>
        assert(java.util.Arrays.equals(viaTrain.centroids(i), direct.centroids(i)),
          s"dispatched centroid $i differs from trainDistributed")
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    // default budget: the same request stays local and clusters as well
    // (bit comparison is meaningless here — the local path's init depends
    // on the collect order of the sample, which is not canonical)
    val viaLocal = CoarseQuantizer.train(df(pts, 5), 16, 2)
    val direct = CoarseQuantizer.trainDistributed(df(pts, 5), 16, 2)
    val (eL, eD) = (sqError(pts, viaLocal), sqError(pts, direct))
    assert(eL <= eD * 1.10 + 1e-9, s"local error $eL vs distributed $eD")
  }

  test("k > n pads deterministically; tiny partitions behave") {
    val pts = blobData(5, 6, 2, seed = 4)
    val q = CoarseQuantizer.trainDistributed(df(pts, 3), 12, 2)
    assert(q.centroids.length == 12)
    assert(q.centroids.forall(_.length == 6))
    val q2 = CoarseQuantizer.trainDistributed(df(pts, 6), 12, 2)
    q.centroids.indices.foreach { i =>
      assert(java.util.Arrays.equals(q.centroids(i), q2.centroids(i)))
    }
  }
}
