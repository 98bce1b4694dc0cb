package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the production DSIR path ([[graft.queries.TextPipeline.dsirSampleGumbel]]:
  * double-precision log-likelihood-ratio weights + deterministic Gumbel
  * top-k) against a from-scratch driver-side reference — feature extraction,
  * md5 bucketing, add-1 smoothed histograms, log-ratio scoring, the hashed
  * uniform and the Gumbel transform all recomputed in plain Scala. The
  * integer-quantized twin (q_dsir_select) shares the same feature/bucket/
  * histogram core and is hash-checked against DuckDB by the driver gate;
  * this spec covers the double/Gumbel arm the oracle cannot express.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val B = 64
  val Seed = "dsirspec"

  /** 30 target docs (lang=en, vocabulary A) + 29 background docs (lang=xx,
    * vocabulary B) + one single-token doc exercising the bigram guard. */
  lazy val fixture: Seq[(Long, String, String)] = {
    val en = (0 until 30).map { i =>
      val toks = (0 until 20).map(j => s"alpha${(i * 7 + j * 3) % 13}")
      (i.toLong, toks.mkString(" "), "en")
    }
    val xx = (0 until 29).map { i =>
      val toks = (0 until 20).map(j => s"beta${(i * 5 + j * 11) % 17}")
      (100L + i, toks.mkString(" "), "xx")
    }
    en ++ xx :+ ((200L, "solo", "xx"))
  }

  def df = {
    import spark.implicits._
    fixture.toDF("doc_id", "text", "lang")
  }

  // ---- driver-side reference ----

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def bucket(f: String, b: Int): Long =
    java.lang.Long.parseLong(md5hex(f).substring(0, 15), 16) % b

  def feats(text: String, order: Int = 2): Seq[String] = {
    val t = text.split(" ", -1).toSeq
    t ++ (if (order >= 2 && t.size >= 2)
      t.sliding(2).map(_.mkString(" ")).toSeq else Nil)
  }

  def reference(nb: Int, order: Int = 2): Seq[(Long, Double, Double)] = {
    val allFeats = fixture.map { case (id, text, lang) =>
      (id, lang, feats(text, order)) }
    val rawHist = allFeats.flatMap(_._3).groupBy(bucket(_, nb)).view
      .mapValues(_.size.toLong).toMap
    val tgtHist = allFeats.filter(_._2 == "en").flatMap(_._3)
      .groupBy(bucket(_, nb)).view.mapValues(_.size.toLong).toMap
    val nq = rawHist.values.sum
    val np = tgtHist.values.sum
    def logR(b: Long): Double =
      math.log((tgtHist.getOrElse(b, 0L) + 1).toDouble / (np + nb)) -
        math.log((rawHist.getOrElse(b, 0L) + 1).toDouble / (nq + nb))
    allFeats.map { case (id, _, fs) =>
      // left-to-right fold in feature order, mirroring Spark's `aggregate`
      val logw = fs.foldLeft(0.0)((acc, f) => acc + logR(bucket(f, nb)))
      val u = (java.lang.Long.parseLong(
        md5hex(Seed + id.toString).substring(0, 15), 16) % 1000000000L + 0.5) / 1e9
      (id, logw, logw - math.log(-math.log(u)))
    }
  }

  def runGumbel(k: Int) = {
    import graft.queries.TextPipeline
    TextPipeline.dsirSampleGumbel(df, col("lang") === "en", k, Seed)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("log_w"),
        r.getAs[Double]("key")))
  }

  def assertMatchesReference(nb: Int, order: Int = 2): Unit = {
    val got = runGumbel(10)
    val want = reference(nb, order)
      .sortBy { case (id, _, key) => (-key, id) }.take(10)
    assert(got.map(_._1).toSeq == want.map(_._1).toSeq,
      s"selection order diverged at B=$nb: got ${got.map(_._1).mkString(",")} " +
        s"want ${want.map(_._1).mkString(",")}")
    got.zip(want).foreach { case ((_, lw, k1), (_, lwRef, kRef)) =>
      assert(math.abs(lw - lwRef) < 1e-9, s"log_w $lw vs reference $lwRef")
      assert(math.abs(k1 - kRef) < 1e-9, s"key $k1 vs reference $kRef")
    }
  }

  test("Gumbel top-k matches the driver reference exactly (ids, order, keys)") {
    assertMatchesReference(B)
  }

  test("the graft.text.dsirBuckets knob re-buckets the production arm") {
    spark.conf.set("graft.text.dsirBuckets", "128")
    try assertMatchesReference(128)
    finally spark.conf.unset("graft.text.dsirBuckets")
  }

  test("the graft.text.dsirNgram knob drops the bigram arm (order=1) and " +
      "still matches the driver reference exactly") {
    spark.conf.set("graft.text.dsirNgram", "1")
    try assertMatchesReference(B, order = 1)
    finally spark.conf.unset("graft.text.dsirNgram")
    // and order=1 genuinely changes the features: some reference log-weight
    // must differ from the order-2 run (the knob is not a no-op)
    val w1 = reference(B, order = 1).map(t => t._1 -> t._2).toMap
    val w2 = reference(B, order = 2).map(t => t._1 -> t._2).toMap
    assert(w1.exists { case (id, w) => math.abs(w - w2(id)) > 1e-9 },
      "order=1 must produce different log-weights than order=2")
  }

  test("the target predicate may reference any input column, not just lang") {
    import graft.queries.TextPipeline
    // doc_id < 100 selects exactly the lang=en fixture docs, so the result
    // must be identical to the lang-based run — but the predicate resolves
    // against a column the bucketed projection does not keep, which only
    // works because is_target is evaluated BEFORE the feature explode
    val byId = TextPipeline.dsirSampleGumbel(df, col("doc_id") < 100L, 10, Seed)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("key")))
    val byLang = runGumbel(10).map(t => (t._1, t._3))
    assert(byId.toSeq == byLang.toSeq)
  }

  test("selection is deterministic across invocations") {
    assert(runGumbel(10).toSeq == runGumbel(10).toSeq)
  }

  test("with disjoint vocabularies the selection is all-target") {
    // target docs' features have raw/target probability ratio ~Nq/Np (~2);
    // background docs' features are absent from the target model, so their
    // log-weights sit tens of nats below — far outside Gumbel noise.
    val sel = runGumbel(10).map(_._1).toSet
    val enIds = fixture.filter(_._3 == "en").map(_._1).toSet
    assert(sel.subsetOf(enIds), s"non-target docs selected: ${sel -- enIds}")
  }

  test("the scoring pass never shuffles the corpus (plan pin)") {
    import graft.queries.TextPipeline
    val plan = TextPipeline.dsirSampleGumbel(df, col("lang") === "en", 10, Seed)
      .queryExecution.executedPlan.toString
    // the returned frame's plan is scan -> project (literal-map aggregate)
    // -> TakeOrderedAndProject: the histogram pass already ran at plan
    // build (driver collect), and the corpus-sized scoring pass must never
    // shuffle BY KEY at any corpus size. (A RoundRobin exchange is allowed:
    // it is `spread`'s small-input parallelizer, which is the identity once
    // the scan exceeds maxPartitionBytes x parallelism — by construction it
    // vanishes at scale.)
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a TakeOrderedAndProject cut, got:\n$plan")
    val keyShuffles = plan.linesIterator
      .filter(_.contains("Exchange")).filterNot(_.contains("RoundRobin")).toSeq
    assert(keyShuffles.isEmpty,
      s"key shuffle in the DSIR scoring plan: $keyShuffles\n$plan")
  }

  test("q_dsir_select invariants at sf0.001 (the hash gate checks values)") {
    val rows = SparkEntry.queries("q_dsir_select")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == graft.queries.TextPipeline.DsirTopK)
    val scores = rows.map(_.getAs[Long]("score_q")).toSeq
    assert(scores == scores.sorted.reverse, "scores must be non-increasing")
    assert(rows.forall(_.getAs[Long]("nf") > 0))
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
  }
}
