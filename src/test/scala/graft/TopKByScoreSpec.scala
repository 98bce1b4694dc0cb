package graft

import graft.functions.{TopKByScore, TopKHeap}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-heap grouped top-k must equal dropDuplicates + window +
  * rank<=k under the (score desc, doc_id asc) total order — the pool-cut
  * shape it replaces — including duplicate rows and score ties. */
class TopKByScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("heap == distinct+window+rank cut on random data with dups and ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    // scores drawn from a small set to force ties; each (q, d) pair
    // repeated 1-3 times (same score — a pure function of the pair)
    val pairs = for {
      q <- 0 until 17
      d <- 0 until 300
      if rnd.nextBoolean()
    } yield (q.toLong, d.toLong, (d * 31 % 13).toDouble / 7.0)
    val rows = pairs.flatMap { p => Seq.fill(1 + rnd.nextInt(3))(p) }
    val shuffled = rnd.shuffle(rows)
    val df = shuffled.toDF("query_id", "doc_id", "score")
      .repartition(7, col("doc_id")) // dups split across partitions

    val k = 25
    val got = df.groupBy(col("query_id"))
      .agg(TopKByScore(col("doc_id"), col("score"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("e"))
      .select(col("query_id"), col("e.doc_id").as("doc_id"),
        col("e.score").as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val expected = df.dropDuplicates("query_id", "doc_id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("doc_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(got.sorted.toSeq == expected.sorted.toSeq)
    // per-group output is ordered (score desc, doc_id asc)
    got.groupBy(_._1).foreach { case (_, g) =>
      val s = g.map(t => (-t._3, t._2)).toSeq
      assert(s == s.sorted)
    }
  }

  test("NaN scores rank first, matching Spark's descending window sort") {
    import spark.implicits._
    // Spark's `score desc` total order places NaN ABOVE every double; the
    // heap must keep and order a NaN candidate identically (a naive `>`
    // comparison is never true for NaN and would silently drop it)
    val rows = Seq(
      (1L, 10L, 3.5), (1L, 11L, Double.NaN), (1L, 12L, 9.0),
      (1L, 13L, Double.NaN), (1L, 14L, Double.PositiveInfinity),
      (1L, 15L, -0.0), (1L, 16L, 0.0), (1L, 17L, 1.0),
      (2L, 20L, Double.NaN), (2L, 21L, 1.0))
    val df = rows.toDF("query_id", "doc_id", "score").repartition(3)
    val k = 5
    val got = df.groupBy(col("query_id"))
      .agg(TopKByScore(col("doc_id"), col("score"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("e"))
      .select(col("query_id"), col("e.doc_id").as("doc_id"),
        col("e.score").as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("doc_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def key(t: (Long, Long, Double)) =
      (t._1, t._2, java.lang.Double.doubleToLongBits(t._3))
    assert(got.sortBy(key).toSeq.map(t => (t._1, t._2, t._3.isNaN)) ==
      expected.sortBy(key).toSeq.map(t => (t._1, t._2, t._3.isNaN)))
    // NaN docs lead each group, ordered by doc_id among themselves
    val g1 = got.filter(_._1 == 1L).map(_._2).toSeq
    assert(g1.take(2) == Seq(11L, 13L), s"NaN first: $g1")
    assert(g1(2) == 14L, "then +Inf")
  }

  test("heap keeps at most one entry per doc and is arrival-order-insensitive") {
    val entries = Seq((5L, 1.0), (6L, 2.0), (5L, 1.0), (7L, 2.0), (8L, 0.5),
      (9L, 2.0), (6L, 2.0), (10L, 3.0))
    val perms = Seq(entries, entries.reverse,
      new scala.util.Random(3L).shuffle(entries))
    val results = perms.map { es =>
      val h = new TopKHeap(3)
      es.foreach { case (d, s) => h.insert(d, s) }
      (0 until h.size).map(i => (h.ids(i), h.scores(i))).sortBy(t => (-t._2, t._1))
    }
    // top-3 of distinct set {(5,1),(6,2),(7,2),(8,.5),(9,2),(10,3)} under
    // (score desc, id asc) = (10,3),(6,2),(7,2)
    results.foreach(r => assert(r == Seq((10L, 3.0), (6L, 2.0), (7L, 2.0))))
  }

  test("membership set survives heavy eviction churn: ascending-score " +
      "stream with duplicates == sort-based reference") {
    // the adversarial shape from the r13 audit: ascending scores make
    // EVERY insert qualify (max evictions, max setRemove backward-shifts),
    // and duplicate ids exercise the O(1) membership probe on both the
    // present and the already-evicted branch
    val rnd = new scala.util.Random(11L)
    val k = 64
    val n = 100000
    val idSpace = 5000 // ids repeat ~20x each
    val entries = Array.tabulate(n) { i =>
      val id = rnd.nextInt(idSpace).toLong
      // score a pure function of the id (the TopKByScore contract), but
      // arrival order interleaves high and low scores
      (id, (id * 2654435761L % 1000003L).toDouble)
    }
    val ascending = entries.sortBy(_._2)
    for (stream <- Seq(ascending, rnd.shuffle(entries.toSeq).toArray)) {
      val h = new TopKHeap(k)
      stream.foreach { case (d, s) => h.insert(d, s) }
      val got = (0 until h.size).map(i => (h.ids(i), h.scores(i)))
        .sortBy(t => (-t._2, t._1))
      val expected = entries.distinct.sortBy(t => (-t._2, t._1)).take(k).toSeq
      assert(got == expected)
    }
  }

  test("duplicate offers with CONFLICTING scores keep the first seen — the " +
      "documented caller contract (emit one pre-aggregated score per doc)") {
    // not a behavior callers may rely on: it pins the failure mode so a
    // future call site feeding un-aggregated rows fails loudly in review.
    // First-wins in BOTH orders — the kept score is arrival-order-dependent,
    // which is exactly why the class header demands pre-aggregation.
    val h1 = new TopKHeap(4)
    h1.insert(7L, 5.0); h1.insert(7L, 9.0)
    assert(h1.size == 1 && h1.ids(0) == 7L && h1.scores(0) == 5.0,
      "low-then-high must keep the first (lower) score")
    val h2 = new TopKHeap(4)
    h2.insert(7L, 9.0); h2.insert(7L, 5.0)
    assert(h2.size == 1 && h2.ids(0) == 7L && h2.scores(0) == 9.0,
      "high-then-low must keep the first (higher) score")
    // below-threshold duplicate of a kept doc on a FULL heap is a plain
    // drop (threshold check fires before the membership probe)
    val h3 = new TopKHeap(2)
    h3.insert(1L, 10.0); h3.insert(2L, 8.0); h3.insert(1L, 1.0)
    val kept = (0 until h3.size).map(i => (h3.ids(i), h3.scores(i))).sortBy(-_._2)
    assert(kept == Seq((1L, 10.0), (2L, 8.0)))
  }

  test("groups smaller than k return all their distinct docs") {
    import spark.implicits._
    val df = Seq((1L, 2L, 0.5), (1L, 2L, 0.5), (1L, 3L, 0.1)).toDF("query_id", "doc_id", "score")
    val got = df.groupBy(col("query_id"))
      .agg(TopKByScore(col("doc_id"), col("score"), 10).as("t"))
      .select(explode(col("t")).as("e")).select(col("e.doc_id")).as[Long]
      .collect().toSeq
    assert(got == Seq(2L, 3L))
  }
}
