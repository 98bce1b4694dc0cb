package graft

import graft.queries.TextPipeline
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the connected-components layer (min-label propagation
  * with the star-contraction fallback, TextPipeline.scala) against a
  * driver-side union-find oracle: for ANY graph the distributed labels must
  * equal the min-node-per-component labeling. Cases cover the shapes the
  * closed-form specs can't enumerate — random sparse graphs, chains past the
  * propagation budget (forcing the Kiveris et al. SoCC'14 contraction
  * path), cliques, stars, self-loops, duplicate edges, isolated nodes.
  * Seeded generation keeps runs deterministic. */
class ClusterPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Driver-side union-find, min node as component label. */
  private def oracle(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // after unioning toward the min root, find() IS the min label
    nodes.map(x => x -> find(x)).toMap
  }

  private def frames(nodes: Seq[Long], edges: Seq[(Long, Long)]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val n = nodes.toDF("doc_id")
    val e =
      if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a_id", "b_id")
      else edges.toDF("a_id", "b_id")
    (n, e)
  }

  private def check(name: String, nodes: Seq[Long], edges: Seq[(Long, Long)]): Unit = {
    val (n, e) = frames(nodes, edges)
    val got = TextPipeline.connectedComponents(n, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = oracle(nodes, edges)
    assert(got == want, s"$name: labels diverge from union-find oracle\n" +
      s"  diff: ${(got.toSet diff want.toSet).take(10)} vs ${(want.toSet diff got.toSet).take(10)}")
  }

  /** Same check through starContract DIRECTLY (skipping propagation), so the
    * contraction fixpoint is exercised even on graphs propagation would
    * finish first. */
  private def checkStar(name: String, nodes: Seq[Long], edges: Seq[(Long, Long)]): Unit = {
    import org.apache.spark.sql.functions.col
    val (n, e) = frames(nodes, edges)
    val sym = e.select(col("a_id").as("u"), col("b_id").as("v"))
    val (labels, _) = TextPipeline.starContract(n, sym)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = oracle(nodes, edges)
    assert(got == want, s"$name (starContract): labels diverge from oracle")
  }

  test("random sparse graphs match the union-find oracle (both paths)") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 6).foreach { case_ =>
      val n = 1 + rnd.nextInt(50)
      // non-contiguous ids: shift + stride so label==id assumptions break loudly
      val nodes = (0 until n).map(i => 1000L + i * 7L)
      val m = rnd.nextInt(2 * n)
      val edges = (0 until m).map { _ =>
        (nodes(rnd.nextInt(n)), nodes(rnd.nextInt(n))) // includes self-loops
      } ++ edges0(rnd, nodes) // plus some duplicates
      check(s"random-$case_", nodes, edges)
      if (case_ <= 2) checkStar(s"random-$case_", nodes, edges)
    }
  }

  private def edges0(rnd: scala.util.Random, nodes: Seq[Long]): Seq[(Long, Long)] =
    if (nodes.length < 2) Nil
    else Seq.fill(3)((nodes(rnd.nextInt(nodes.length)), nodes(rnd.nextInt(nodes.length))))

  test("chain past the propagation budget converges via star contraction") {
    // 40-link chain: propagation alone would need 40 rounds; the fallback
    // fires at StarFallbackAt=5 and must still produce exact labels
    val nodes = (0L until 41L).map(_ * 3L + 5L)
    val edges = nodes.sliding(2).map(p => (p(1), p(0))).toSeq
    check("chain-41", nodes, edges)
  }

  test("two cliques, a star, and isolated nodes (both paths)") {
    val cliqueA = (0L until 8L).map(_ + 100L)
    val cliqueB = (0L until 6L).map(_ + 200L)
    val starCtr = 300L
    val starLeaves = (1L to 5L).map(_ + 300L)
    val isolated = Seq(400L, 401L)
    val nodes = cliqueA ++ cliqueB ++ (starCtr +: starLeaves) ++ isolated
    val edges =
      (for (a <- cliqueA; b <- cliqueA if a < b) yield (a, b)) ++
        (for (a <- cliqueB; b <- cliqueB if a < b) yield (a, b)) ++
        starLeaves.map(l => (starCtr, l))
    check("mixed", nodes, edges)
    checkStar("mixed", nodes, edges)
  }

  test("edgeless and single-node graphs label themselves") {
    check("edgeless", Seq(7L, 11L, 13L), Nil)
    check("single", Seq(42L), Nil)
    checkStar("edgeless", Seq(7L, 11L, 13L), Nil)
  }
}
