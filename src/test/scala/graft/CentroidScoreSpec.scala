package graft

import graft.functions.{BatchCentroidScore, CentroidScore}
import graft.quantizers.CoarseQuantizer
import graft.scoring.Plaid
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native phase-1 expression computes each (token, code) dot lazily
  * against the broadcast centroid matrix — it must be bit-identical to the
  * Plaid kernel over a precomputed CoarseQuantizer.scoreBlock matrix (the
  * plan-constant design it replaced), and must run inside whole-stage
  * codegen. */
class CentroidScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val rnd = new scala.util.Random(11L)
  val nq = 4
  val nc = 8
  val dim = 16
  val centroids = Array.fill(nc)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
  val queryFlat = Array.fill(nq * dim)(rnd.nextFloat() * 2 - 1)
  // the precomputed-matrix twin the lazy dot must reproduce bit-exactly
  lazy val matrix = new CoarseQuantizer(centroids).scoreBlock(queryFlat, nq)
  lazy val bcCent = {
    val flat = new Array[Float](nc * dim)
    centroids.zipWithIndex.foreach { case (c, i) =>
      System.arraycopy(c, 0, flat, i * dim, dim)
    }
    spark.sparkContext.broadcast(flat)
  }

  test("lazy dot matches Plaid over a scoreBlock matrix on random code lists") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(nc).toLong))
    }
    val df = rows.toDF("id", "codes")
      .select(col("id"), CentroidScore(col("codes"), queryFlat, bcCent, nq, dim).as("s"))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, codes) =>
      val expected = Plaid.colbertCentroidScore(codes.toArray, matrix, nq, nc).toDouble
      assert(got(id) == expected, s"row $id")
    }
  }

  test("SIMD token-lane kernel (computeDotT) is bit-identical to computeDot " +
      "across widths, tails, and NaN") {
    // nq sweeps below one vector width (pure scalar tail), exactly at, and
    // past it (vector body + tail); the NaN case pins the blend-not-max
    // choice: a NaN dot must KEEP the running max, as the scalar `>` does
    val r2 = new scala.util.Random(23L)
    for (nqv <- Seq(1, 3, 4, 8, 16, 17, 32, 33); dimv <- Seq(4, 128)) {
      val ncv = 16
      val cent = Array.fill(ncv * dimv)(r2.nextFloat() * 2 - 1)
      val q = Array.fill(nqv * dimv)(r2.nextFloat() * 2 - 1)
      val codes = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill(5)(r2.nextInt(ncv).toLong))
      val old = CentroidScore.computeDot(codes, q, cent, nqv, dimv)
      val neu = CentroidScore.computeDotT(codes,
        CentroidScore.transposeQuery(q, dimv), cent, nqv, dimv)
      assert(java.lang.Double.doubleToRawLongBits(old) ==
        java.lang.Double.doubleToRawLongBits(neu),
        s"nq=$nqv dim=$dimv: $old vs $neu")
    }
    // NaN in one query token's dims: both paths must agree bit-for-bit
    val dimn = 8; val nqn = 9; val ncn = 4
    val cent = Array.fill(ncn * dimn)(1f)
    val q = Array.fill(nqn * dimn)(1f)
    q(3 * dimn + 2) = Float.NaN // token 3 produces NaN dots
    val codes = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(0L, 1L, 2L))
    val old = CentroidScore.computeDot(codes, q, cent, nqn, dimn)
    val neu = CentroidScore.computeDotT(codes,
      CentroidScore.transposeQuery(q, dimn), cent, nqn, dimn)
    assert(java.lang.Double.doubleToRawLongBits(old) ==
      java.lang.Double.doubleToRawLongBits(neu), s"NaN case: $old vs $neu")
  }

  test("long[] twins (computeDotAutoL/computeDotL) are bit-identical to " +
      "the ArrayData originals across widths") {
    val r3 = new scala.util.Random(31L)
    for (nqv <- Seq(1, 4, 16, 32, 33); dimv <- Seq(4, 128)) {
      val ncv = 16
      val cent = Array.fill(ncv * dimv)(r3.nextFloat() * 2 - 1)
      val q = Array.fill(nqv * dimv)(r3.nextFloat() * 2 - 1)
      val qt = CentroidScore.transposeQuery(q, dimv)
      val raw = Array.fill(7)(r3.nextInt(ncv).toLong)
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(raw)
      val viaAd = CentroidScore.computeDotAuto(ad, q, qt, cent, nqv, dimv)
      val viaL = CentroidScore.computeDotAutoL(raw, q, qt, cent, nqv, dimv)
      assert(java.lang.Double.doubleToRawLongBits(viaAd) ==
        java.lang.Double.doubleToRawLongBits(viaL), s"auto nq=$nqv dim=$dimv")
      val scalarAd = CentroidScore.computeDot(ad, q, cent, nqv, dimv)
      val scalarL = CentroidScore.computeDotL(raw, q, cent, nqv, dimv)
      assert(java.lang.Double.doubleToRawLongBits(scalarAd) ==
        java.lang.Double.doubleToRawLongBits(scalarL), s"scalar nq=$nqv dim=$dimv")
    }
  }

  test("slice variants (computeDotAutoLRange/computeDotLRange) score a " +
      "shared flat array in place, bit-identical to the copied-slice path") {
    val r4 = new scala.util.Random(47L)
    for (nqv <- Seq(1, 4, 16, 32, 33); dimv <- Seq(4, 128); len <- Seq(0, 1, 7)) {
      val ncv = 16
      val cent = Array.fill(ncv * dimv)(r4.nextFloat() * 2 - 1)
      val q = Array.fill(nqv * dimv)(r4.nextFloat() * 2 - 1)
      val qt = CentroidScore.transposeQuery(q, dimv)
      // the slice sits mid-array with junk codes on both sides — the range
      // entry must touch ONLY [from, until)
      val pre = Array.fill(3)(r4.nextInt(ncv).toLong)
      val mid = Array.fill(len)(r4.nextInt(ncv).toLong)
      val post = Array.fill(5)(r4.nextInt(ncv).toLong)
      val flat = pre ++ mid ++ post
      val from = pre.length; val until = pre.length + mid.length
      val viaCopy = CentroidScore.computeDotAutoL(
        java.util.Arrays.copyOfRange(flat, from, until), q, qt, cent, nqv, dimv)
      val viaRange = CentroidScore.computeDotAutoLRange(
        flat, from, until, q, qt, cent, nqv, dimv)
      assert(java.lang.Double.doubleToRawLongBits(viaCopy) ==
        java.lang.Double.doubleToRawLongBits(viaRange),
        s"auto-range nq=$nqv dim=$dimv len=$len")
      val scalarCopy = CentroidScore.computeDotL(
        java.util.Arrays.copyOfRange(flat, from, until), q, cent, nqv, dimv)
      val scalarRange = CentroidScore.computeDotLRange(
        flat, from, until, q, cent, nqv, dimv)
      assert(java.lang.Double.doubleToRawLongBits(scalarCopy) ==
        java.lang.Double.doubleToRawLongBits(scalarRange),
        s"scalar-range nq=$nqv dim=$dimv len=$len")
    }
  }

  test("CtxCodes.build dedups on first occurrence and indexOf finds every doc") {
    val rows = Array(
      (7L, Array(1L, 2L)), (3L, Array(9L)), (7L, Array(5L)), (11L, Array(0L, 0L, 4L)))
    val snap = graft.functions.CtxCodes.build(rows)
    assert(snap.docIds.toSeq == Seq(3L, 7L, 11L))
    def codesOf(id: Long): Seq[Long] = {
      val i = graft.functions.CtxCodes.indexOf(snap, id)
      snap.codes.slice(snap.offsets(i), snap.offsets(i + 1)).toSeq
    }
    assert(codesOf(3L) == Seq(9L))
    assert(codesOf(7L) == Seq(1L, 2L), "first occurrence must win on duplicate ids")
    assert(codesOf(11L) == Seq(0L, 0L, 4L))
    assert(graft.functions.CtxCodes.indexOf(snap, 99L) < 0)
  }

  test("CtxCodes.inverted reproduces explode(array_distinct(doc_codes)) " +
      "with ascending doc positions per centroid") {
    // doc 11 repeats centroid 0 (two tokens, one posting — array_distinct
    // semantics); centroid 3 has no docs (empty slice, not a crash);
    // duplicate doc 7 rows: first occurrence (codes 1,2) wins in the
    // forward snapshot, so the postings view lists doc 7 under 1 and 2
    // only — the view is derived from the codes actually scored
    val rows = Array(
      (7L, Array(1L, 2L)), (3L, Array(9L)), (7L, Array(5L)),
      (11L, Array(0L, 0L, 4L)), (2L, Array(1L)))
    val snap = graft.functions.CtxCodes.build(rows)
    val inv = snap.inverted
    assert(inv.numCentroids == 10) // max code 9 -> ids 0..9
    def docsOf(c: Int): Seq[Long] =
      (inv.offsets(c) until inv.offsets(c + 1)).map(j => snap.docIds(inv.docPos(j)))
    assert(docsOf(0) == Seq(11L))
    assert(docsOf(1) == Seq(2L, 7L), "positions must ascend (doc order)")
    assert(docsOf(2) == Seq(7L))
    assert(docsOf(3) == Seq.empty)
    assert(docsOf(4) == Seq(11L))
    assert(docsOf(5) == Seq.empty, "the dropped duplicate row posts nothing")
    assert(docsOf(9) == Seq(3L))
    assert(inv.docPos.length == 6, "one posting per (doc, distinct centroid)")
    // brute-force parity on a random corpus: every (centroid, doc) posting
    // appears exactly once and matches the per-doc distinct codes
    val rnd = new scala.util.Random(7)
    val big = Array.tabulate(200)(i =>
      (i.toLong, Array.fill(1 + rnd.nextInt(12))(rnd.nextInt(40).toLong)))
    val bigSnap = graft.functions.CtxCodes.build(big)
    val bigInv = bigSnap.inverted
    val expected = big.flatMap { case (d, cs) => cs.distinct.map(c => (c, d)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    (0 until bigInv.numCentroids).foreach { c =>
      val got = (bigInv.offsets(c) until bigInv.offsets(c + 1))
        .map(j => bigSnap.docIds(bigInv.docPos(j)))
      assert(got == expected.getOrElse(c.toLong, Seq.empty),
        s"centroid $c postings diverged")
    }
  }

  test("batch expression routes each query_id to its own token vectors") {
    import spark.implicits._
    val q2 = Array.fill(2 * dim)(rnd.nextFloat() * 2 - 1) // nq=2 second query
    val bq = spark.sparkContext.broadcast(Map(7L -> queryFlat, 8L -> q2))
    val m2 = new CoarseQuantizer(centroids).scoreBlock(q2, 2)
    val rows = (0 until 100).map { i =>
      (if (i % 2 == 0) 7L else 8L,
        Seq.fill(1 + rnd.nextInt(6))(rnd.nextInt(nc).toLong), i)
    }
    val df = rows.toDF("qid", "codes", "i")
      .select(col("i"), col("qid"),
        BatchCentroidScore(col("qid"), col("codes"), bq, bcCent, dim).as("s"))
    val got = df.collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    rows.foreach { case (qid, codes, i) =>
      val expected =
        if (qid == 7L) Plaid.colbertCentroidScore(codes.toArray, matrix, nq, nc)
        else Plaid.colbertCentroidScore(codes.toArray, m2, 2, nc)
      assert(got(i) == expected.toDouble, s"row $i qid $qid")
    }
  }

  test("expression stays inside WholeStageCodegen") {
    // a range source (a local Seq constant-folds to LocalTableScan)
    val df = spark.range(100)
      .select(CentroidScore(
        sequence(lit(0L), col("id") % (nc - 1)), queryFlat, bcCent, nq, dim).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` operator prefix marks WholeStageCodegen participation
    assert(plan.contains("*(1) Project [graft_centroid_score"), plan)
    assert(df.agg(sum(col("s"))).collect().head.getDouble(0) != 0.0)
  }

  test("null codes yield null score (null-intolerant)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Seq[Long]]), (2L, Some(Seq(0L))))
      .toDF("id", "codes")
      .select(col("id"), CentroidScore(col("codes"), queryFlat, bcCent, nq, dim).as("s"))
    val rows = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows(1L) && !rows(2L))
  }
}
