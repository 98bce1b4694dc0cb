package graft

import graft.query.Searcher
import org.scalatest.funsuite.AnyFunSuite

/** Pins the primitive-heap probe selection (Searcher.topCentroids) to the
  * straightforward sort-everything formulation it replaced: identical probe
  * lists, including tie-breaks, across random matrices with planted ties,
  * negative scores, and degenerate kTop/nProbe values. */
class ProbeSelectionSpec extends AnyFunSuite {

  /** The pre-heap formulation, verbatim: per token sort all (centroid,
    * score) by (score desc, id asc), take kTop, record positive maxima,
    * sort again for the probe cut. */
  private def naive(m: Array[Float], nq: Int, nc: Int,
      kTop: Int, nProbe: Int): Seq[Long] = {
    val high = new Array[Float](nc)
    (0 until nq).foreach { i =>
      (0 until nc).map(c => (c, m(i * nc + c))).sortBy { case (c, s) => (-s, c) }
        .take(kTop).foreach { case (c, s) => if (s > high(c)) high(c) = s }
    }
    high.zipWithIndex.filter(_._1 > 0)
      .sortBy { case (s, c) => (-s, c) }.take(nProbe).map(_._2.toLong).toSeq
  }

  test("heap selection == sort selection across random matrices (ties planted)") {
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(seed)
      val nq = 1 + rnd.nextInt(4)
      val nc = 1 + rnd.nextInt(300)
      // draw from a SMALL discrete set so score ties (the tie-break path)
      // occur constantly, and include negatives (the score>0 prune)
      val m = Array.fill(nq * nc)((rnd.nextInt(9) - 3) * 0.25f)
      for (kTop <- Seq(1, 3, nc); nProbe <- Seq(1, 7, nc, nc + 5)) {
        val got = Searcher.topCentroids(m, nq, nc, kTop, nProbe).toSeq
        val want = naive(m, nq, nc, kTop, nProbe)
        assert(got == want,
          s"seed=$seed nq=$nq nc=$nc kTop=$kTop nProbe=$nProbe")
      }
    }
  }

  test("degenerate inputs: all-negative scores, kTop=0-equivalent, single centroid") {
    // all scores <= 0: nothing survives the positive prune
    assert(Searcher.topCentroids(Array(-1f, 0f, -2f), 1, 3, 2, 8).isEmpty)
    // one centroid, positive
    assert(Searcher.topCentroids(Array(0.5f), 1, 1, 1, 4).toSeq == Seq(0L))
  }
}
