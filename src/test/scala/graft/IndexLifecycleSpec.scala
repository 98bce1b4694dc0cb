package graft

import graft.core._
import graft.index.IndexIVF
import org.scalatest.funsuite.AnyFunSuite

/** Model-based lifecycle test for the epoch/tombstone delete machinery
  * (IndexIVF.scala): a seeded-random interleaving of add / remove /
  * removeDeferred / compact / update is replayed against a driver-side model
  * (the set of ids that SHOULD be visible), and after every step the index's
  * visible doc set — through the `live()` read funnel, i.e. with pending
  * tombstones applied at their epochs — must equal the model in both the
  * docs and scalars tables. This is the generalization of the targeted
  * IndexSpec cases (removeDeferred -> re-add -> compact, double tombstone,
  * update-after-removeDeferred): ANY interleaving must respect epoch
  * ordering, not just the three hand-picked ones. A second tenant ingested
  * up front must come out untouched (tenant isolation under randomized
  * maintenance). Reference semantics: synchronous mapping-CF deletes
  * (lintdb/invlists/RocksdbInvertedList.cpp:22-95) composed with
  * read-modify-write never lose a re-added doc. */
class IndexLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = GSchema(Seq(
    GField.indexedStored("val", GDataType.INTEGER),
    GField.stored("body", GDataType.TEXT)))

  private def docsFor(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, i * 10, s"doc-$i")).toDF("id", "val", "body")
  }

  private def visible(idx: IndexIVF, tenant: Long): Set[Long] = {
    import org.apache.spark.sql.functions.col
    val d = idx.docsDf.filter(col("tenant") === tenant)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val s = idx.scalarsDf.filter(col("tenant") === tenant)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(d == s, s"docs and scalars tables disagree on visible ids: " +
      s"docs-only ${d diff s}, scalars-only ${s diff d}")
    d
  }

  test("random add/remove/removeDeferred/compact/update interleavings match the model") {
    val path = java.nio.file.Files.createTempDirectory("idx_lifecycle").toString
    val idx = IndexIVF.create(spark, path, schema)
    val rnd = new scala.util.Random(20260813L)
    // 20/21 overlap the merge-source ids: a local remove of 20 followed by a
    // merge re-surfaces it (imported rows carry a fresh local epoch), and a
    // local re-add of 21 must NOT be hidden by the OTHER index's pending
    // tombstone on 21 (foreign tombstones are never imported)
    val idPool = (0L until 12L) :+ 20L :+ 21L

    // tenant-2 fixture: must survive every tenant-1 op below unchanged
    idx.add(tenant = 2, docsFor(Seq(3L, 5L, 7L)))

    var model = Set.empty[Long] // ids visible in tenant 1
    idx.add(tenant = 1, docsFor(idPool.take(6)))
    model ++= idPool.take(6)

    // a second index to merge from: docs 20-24 live, 21 under a PENDING
    // deferred delete — merge must copy only the other side's live rows and
    // must NOT import its tombstone (21 re-added locally later must survive)
    val otherPath = java.nio.file.Files.createTempDirectory("idx_lifecycle_other").toString
    val other = IndexIVF.create(spark, otherPath, schema)
    other.add(tenant = 1, docsFor(Seq(20L, 21L, 22L, 23L, 24L)))
    other.removeDeferred(1, Seq(21L))
    val mergedLive = Set(20L, 22L, 23L, 24L)

    def someIds(): Seq[Long] = {
      val n = 1 + rnd.nextInt(3)
      Seq.fill(n)(idPool(rnd.nextInt(idPool.length))).distinct
    }

    val ops = (1 to 22).map(_ => rnd.nextInt(11))
    ops.zipWithIndex.foreach { case (op, step) =>
      val trace = new StringBuilder(s"step $step: ")
      op match {
        case 0 | 1 | 2 =>
          // add (re-add included: a pending tombstone must NOT hide these)
          val ids = someIds()
          trace ++= s"add(${ids.mkString(",")})"
          idx.add(1, docsFor(ids)); model ++= ids
        case 3 | 4 =>
          val ids = someIds()
          trace ++= s"remove(${ids.mkString(",")})"
          idx.remove(1, ids); model --= ids
        case 5 | 6 =>
          // deferred delete hides immediately through live()
          val ids = someIds()
          trace ++= s"removeDeferred(${ids.mkString(",")})"
          idx.removeDeferred(1, ids); model --= ids
        case 7 =>
          trace ++= "compact()"
          idx.compact() // applies pending tombstones; no visible change
        case 8 =>
          val ids = someIds()
          trace ++= s"update(${ids.mkString(",")})"
          idx.update(1, docsFor(ids)); model ++= ids
        case 9 =>
          trace ++= "compactFiles()"
          idx.compactFiles() // pure file hygiene; no visible change
        case 10 =>
          // merge: the other side's live rows become visible (duplicates on
          // re-merge collapse in the distinct visibility check); its pending
          // tombstone on 21 applies to ITS copy only and is not imported —
          // and merge() first compacts any pending LOCAL tombstones, which
          // changes nothing visible (the model already excludes them)
          trace ++= "merge(other)"
          idx.merge(otherPath); model ++= mergedLive
      }
      assert(visible(idx, 1) == model, s"$trace: visible set diverged from model")
    }

    // final compact + reopen: physical state must still match the model, and
    // tenant 2 must be exactly its original ingest
    idx.compact()
    val reopened = IndexIVF.open(spark, path)
    assert(visible(reopened, 1) == model, "post-compact reopen diverged from model")
    assert(visible(reopened, 2) == Set(3L, 5L, 7L), "tenant-2 fixture was disturbed")
  }

  test("epoch snapshots: openAt sees each historical visible set; snapshot handles refuse writes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dim = 8
    val rnd = new scala.util.Random(12L)
    val corpus = (0L until 6L).map(i =>
      i -> Seq.fill(3)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))).toMap
    def docsOf(ids: Seq[Long]) = corpus.filter(kv => ids.contains(kv._1)).toSeq
      .sortBy(_._1).map { case (i, t) => Doc(i, t, s"c$i", i % 2) }.toDF()
    val path = java.nio.file.Files.createTempDirectory("idx_snapshot").toString
    val idx = IndexIVF.create(spark, path,
      GSchema(Seq(GField.colbert("colbert", dim, numCentroids = 2, numIterations = 2),
        GField(name = "cat", dataType = GDataType.TEXT.toString,
          roles = Seq(FieldRole.Indexed.toString, FieldRole.Stored.toString)),
        GField.indexed("num", GDataType.INTEGER))))
    idx.train(docsOf(corpus.keys.toSeq))
    idx.add(1, docsOf(Seq(0L, 1L, 2L))); val e1 = idx.currentEpoch()
    idx.add(1, docsOf(Seq(3L, 4L, 5L))); val e2 = idx.currentEpoch()
    idx.removeDeferred(1, Seq(0L, 1L)); val e3 = idx.currentEpoch()
    def vis(h: IndexIVF): Set[Long] =
      h.docsDf.filter(col("tenant") === 1).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val s1 = IndexIVF.openAt(spark, path, e1)
    val s2 = IndexIVF.openAt(spark, path, e2)
    val s3 = IndexIVF.openAt(spark, path, e3)
    assert(vis(s1) == Set(0L, 1L, 2L), s"at e1: ${vis(s1)}")
    assert(vis(s2) == Set(0L, 1L, 2L, 3L, 4L, 5L), s"at e2: ${vis(s2)}")
    assert(vis(s3) == Set(2L, 3L, 4L, 5L), s"at e3: ${vis(s3)}")
    assert(vis(IndexIVF.open(spark, path)) == Set(2L, 3L, 4L, 5L))
    // postings/context agree with docs inside a snapshot
    val pVis = s1.postingsDf.filter(col("tenant") === 1)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(pVis == Set(0L, 1L, 2L), s"postings at e1: $pVis")
    // a search through the snapshot retrieves a doc that is deleted NOW
    val q = corpus(0L).map(_.toArray).toArray
    val hit = s1.search(1, graft.query.VectorQuery("colbert", q), k = 3,
      graft.query.SearchOptions(kTopCentroids = 2, nProbe = 2))
      .select("doc_id").collect().map(_.getLong(0))
    assert(hit.contains(0L), s"snapshot search should see doc 0: ${hit.toSeq}")
    // snapshot handles refuse every mutator
    intercept[IllegalArgumentException](s1.add(1, docsOf(Seq(5L))))
    intercept[IllegalArgumentException](s1.removeDeferred(1, Seq(2L)))
    intercept[IllegalArgumentException](s1.compact())
    intercept[IllegalArgumentException](s1.train(docsOf(Seq(2L))))
    // out-of-range epochs refuse
    intercept[IllegalArgumentException](IndexIVF.openAt(spark, path, e3 + 10))
    // snapshots are unaffected by writes made after they were taken
    idx.add(1, docsOf(Seq(0L)))
    assert(vis(s3) == Set(2L, 3L, 4L, 5L), "existing snapshot must not drift")
  }

  test("model versioning: openAt scores with the model in effect at its " +
      "epoch after a retrain; remove/compact raise the history floor") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(77L)
    val corpus = (0L until 8L).map(i =>
      i -> Seq.fill(3)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))).toMap
    def docsOf(ids: Seq[Long]) = corpus.filter(kv => ids.contains(kv._1)).toSeq
      .sortBy(_._1).map { case (i, t) => Doc(i, t, s"c$i", i % 2) }.toDF()
    val path = java.nio.file.Files.createTempDirectory("idx_modelver").toString
    // BINARIZER on purpose: its phase-2 reconstruction depends on the codec
    // MODEL, so a snapshot silently scoring with a retrained model would
    // change scores — the exact regression this pins
    val idx = IndexIVF.create(spark, path,
      GSchema(Seq(GField.colbert("colbert", dim, numCentroids = 2,
        numIterations = 2, quantization = QuantizerKind.BINARIZER),
        GField(name = "cat", dataType = GDataType.TEXT.toString,
          roles = Seq(FieldRole.Indexed.toString, FieldRole.Stored.toString)),
        GField.indexed("num", GDataType.INTEGER))))
    idx.train(docsOf(Seq(0L, 1L, 2L, 3L)))
    idx.add(1, docsOf(Seq(0L, 1L, 2L, 3L)))
    val e1 = idx.currentEpoch()
    val q = corpus(0L).map(_.toArray).toArray
    def ranking(h: IndexIVF): Seq[(Long, Double)] =
      h.search(1, graft.query.VectorQuery("colbert", q), k = 4,
        graft.query.SearchOptions(kTopCentroids = 2, nProbe = 2))
        .select("doc_id", "score").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val r1 = ranking(IndexIVF.openAt(spark, path, e1))

    // RETRAIN: fresh centroids + binarizer from a DIFFERENT doc subset on a
    // freshly opened handle (train() keeps models already present in
    // memory, so a retrain is exactly "clear and train again")
    val idx2 = IndexIVF.open(spark, path)
    idx2.coarse = Map.empty; idx2.quantizers = Map.empty
    idx2.train(docsOf(Seq(4L, 5L, 6L, 7L)))
    idx2.add(1, docsOf(Seq(4L, 5L)))

    // the snapshot at e1 must return the ORIGINAL ranking bit-for-bit —
    // model files are epoch-stamped, and openAt resolves the newest stamp
    // <= its epoch, not the current (retrained) files
    val s1 = IndexIVF.openAt(spark, path, e1)
    assert(ranking(s1) == r1,
      "snapshot ranking drifted after retrain: openAt must load the model " +
        "generation in effect at its epoch")
    // sanity that the pin is not vacuous: the CURRENT handle decodes doc
    // 0's (original-codec) codes with the retrained model and scores it
    // differently
    val curScore0 = ranking(idx2).toMap.get(0L)
    val oldScore0 = r1.toMap.get(0L)
    assert(curScore0.isDefined && oldScore0.isDefined && curScore0 != oldScore0,
      s"retrain did not change doc 0's score ($curScore0 vs $oldScore0): " +
        "the model-version pin would be vacuous")

    // remove() physically rewrites history: the floor rises to its epoch
    // and every older snapshot refuses instead of serving partial data
    idx2.remove(1, Seq(3L))
    val eRemove = idx2.currentEpoch()
    assert(idx2.historyFloor() == eRemove, "remove must raise the floor")
    // the refusal must be the FLOOR diagnostic, checked BEFORE load() (r14
    // ADVICE): e1's stamps are about to be vacuumed below, and load()'s
    // rows-at-or-before guard would otherwise run a postings-scan job and
    // throw the misleading unstamped-legacy error for this doomed epoch
    val floorErr = intercept[IllegalArgumentException](
      IndexIVF.openAt(spark, path, e1))
    assert(floorErr.getMessage.contains("predates the history floor"),
      s"below-floor openAt must fail with the floor diagnostic: $floorErr")
    intercept[IllegalArgumentException](IndexIVF.openAt(spark, path, eRemove - 1))
    assert(ranking(IndexIVF.openAt(spark, path, eRemove)).nonEmpty,
      "snapshots at/after the floor must still open")
    // the floor rise VACUUMS unreachable model stamps (r13 audit note 3):
    // the first train's stamp can never be loaded again (openAt refuses
    // its epochs), so it is pruned; the retrain's stamp — the newest <=
    // floor — is kept and still serves openAt(floor) with the exact
    // retrained model (bit-for-bit vs the live handle on the same rows)
    def stampEpochs(): Set[Long] = {
      import scala.jdk.CollectionConverters._
      val h = java.nio.file.Paths.get(s"$path/_meta/history")
      val s = java.nio.file.Files.list(h)
      try s.iterator().asScala
        .flatMap(_.getFileName.toString.toLongOption).toSet
      finally s.close()
    }
    val afterRemove = stampEpochs()
    assert(!afterRemove.contains(1L),
      s"first train's stamp must be vacuumed once the floor passes it: $afterRemove")
    assert(afterRemove.exists(_ <= eRemove),
      "the newest stamp <= floor must survive the vacuum (it serves " +
        s"openAt(floor)): $afterRemove")
    assert(ranking(IndexIVF.openAt(spark, path, eRemove)) == ranking(idx2),
      "openAt(floor) must still score with the surviving retrain stamp")

    // compact() after a deferred delete applies tombstones physically: the
    // floor rises to the counter (a snapshot between the removeDeferred
    // and the compact would resurrect physically-deleted rows)
    idx2.removeDeferred(1, Seq(2L))
    val eDeferred = idx2.currentEpoch()
    assert(IndexIVF.openAt(spark, path, eRemove).snapshot.isDefined,
      "pre-compact: epoch eRemove is still reproducible (tombstone-masked)")
    idx2.compact()
    assert(idx2.historyFloor() == idx2.currentEpoch(),
      "compact must raise the floor to the counter")
    intercept[IllegalArgumentException](IndexIVF.openAt(spark, path, eRemove))
    intercept[IllegalArgumentException](IndexIVF.openAt(spark, path, eDeferred - 1))
    assert(ranking(IndexIVF.openAt(spark, path, idx2.currentEpoch())).nonEmpty)
  }

  test("openAt refuses a pre-retrain epoch whose rows were scored by an " +
      "UNSTAMPED legacy model that a retrain overwrote") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(78L)
    val corpus = (0L until 6L).map(i =>
      i -> Seq.fill(2)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))).toMap
    def docsOf(ids: Seq[Long]) = corpus.filter(kv => ids.contains(kv._1)).toSeq
      .sortBy(_._1).map { case (i, t) => Doc(i, t, s"c$i", i % 2) }.toDF()
    val path = java.nio.file.Files.createTempDirectory("idx_legacy").toString
    val idx = IndexIVF.create(spark, path,
      GSchema(Seq(GField.colbert("colbert", dim, numCentroids = 2,
        numIterations = 2),
        GField(name = "cat", dataType = GDataType.TEXT.toString,
          roles = Seq(FieldRole.Indexed.toString, FieldRole.Stored.toString)),
        GField.indexed("num", GDataType.INTEGER))))
    idx.train(docsOf(Seq(0L, 1L, 2L)))
    idx.add(1, docsOf(Seq(0L, 1L, 2L)))
    val eAdd = idx.currentEpoch()
    // simulate a PRE-VERSIONING index: the model exists only unstamped
    val hist = java.nio.file.Paths.get(s"$path/_meta/history")
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(hist)
    try walk.iterator().asScala.toVector.reverse
      .foreach(java.nio.file.Files.delete)
    finally walk.close()
    // retrain stamps the NEW model at a later epoch — the r13 ADVICE hole:
    // stamps.nonEmpty used to skip the legacy refusal, load the field as
    // untrained, and fail later with a misleading 'not trained' error
    val idx2 = IndexIVF.open(spark, path)
    idx2.coarse = Map.empty; idx2.quantizers = Map.empty
    idx2.train(docsOf(Seq(3L, 4L, 5L)))
    idx2.add(1, docsOf(Seq(3L)))
    val ex = intercept[IllegalArgumentException](
      IndexIVF.openAt(spark, path, eAdd))
    assert(ex.getMessage.contains("before model versioning"),
      s"must refuse with the unstamped-legacy guidance, got: ${ex.getMessage}")
    // an epoch BEFORE any rows existed still opens (truly untrained then),
    // and an epoch at/after the retrain stamp opens with the new model
    assert(IndexIVF.openAt(spark, path, 0L).snapshot.isDefined)
    val q = corpus(3L).map(_.toArray).toArray
    val hits = IndexIVF.openAt(spark, path, idx2.currentEpoch())
      .search(1, graft.query.VectorQuery("colbert", q), k = 2,
        graft.query.SearchOptions(kTopCentroids = 2, nProbe = 2))
      .select("doc_id").collect().map(_.getLong(0))
    assert(hits.contains(3L))
    // r14 review finding: a PENDING tombstone at T2 > eAdd must not blind
    // the guard. The writable handle's live() funnel masks the legacy rows
    // under that tombstone, but a snapshot at eAdd — whose own tombstonesDf
    // excludes epochs > eAdd — would still SERVE them; the guard therefore
    // reads the raw table, and the refusal must stand.
    idx2.removeDeferred(1, Seq(0L, 1L, 2L, 3L))
    val ex2 = intercept[IllegalArgumentException](
      IndexIVF.openAt(spark, path, eAdd))
    assert(ex2.getMessage.contains("before model versioning"),
      s"pending tombstones above the epoch must not blind the legacy " +
        s"guard, got: ${ex2.getMessage}")
  }

  // the epoch machinery is most dangerous on the TENSOR tables (postings
  // is the 100 TB table compact() rewrites targeted partitions of) — a
  // shorter randomized walk over a trained colbert index, with the
  // visible-set probe reading postings, context AND docs and requiring
  // them to agree with the model after every op. Parameterized by codec:
  // the residual encode/decode sits inside add/update/compact, so a codec
  // bug in the MUTATION flows (not just search) surfaces here.
  for (quant <- Seq(QuantizerKind.NONE, QuantizerKind.SQ8))
  test(s"tensor-schema walk ($quant): postings/context/docs stay model-consistent under the delete lifecycle") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(8L)
    val corpus = (0L until 10L).map(i =>
      i -> Seq.fill(3)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))).toMap
    def docsOf(ids: Seq[Long]) = corpus.filter(kv => ids.contains(kv._1)).toSeq
      .sortBy(_._1).map { case (i, t) => Doc(i, t, s"c$i", i % 2) }.toDF()
    val path = java.nio.file.Files.createTempDirectory("idx_lifecycle_t").toString
    val idx = IndexIVF.create(spark, path,
      GSchema(Seq(GField.colbert("colbert", dim, numCentroids = 4, numIterations = 3,
        quantization = quant),
        GField(name = "cat", dataType = GDataType.TEXT.toString,
          roles = Seq(FieldRole.Indexed.toString, FieldRole.Stored.toString)),
        GField.indexed("num", GDataType.INTEGER))))
    idx.train(docsOf(corpus.keys.toSeq))
    def allVisible(): Set[Long] = {
      import org.apache.spark.sql.functions.col
      val byTable = Seq("postings" -> idx.postingsDf, "context" -> idx.contextDf,
        "docs" -> idx.docsDf).map { case (name, df) =>
        name -> df.filter(col("tenant") === 1).select("doc_id")
          .distinct().collect().map(_.getLong(0)).toSet
      }
      val sets = byTable.map(_._2).distinct
      assert(sets.size == 1, s"tables disagree on visible ids: $byTable")
      sets.head
    }
    var model = Set.empty[Long]
    idx.add(1, docsOf(Seq(0L, 1L, 2L, 3L, 4L))); model ++= Seq(0L, 1L, 2L, 3L, 4L)
    val ids = corpus.keys.toSeq.sorted
    (1 to 10).foreach { step =>
      val pick = Seq.fill(1 + rnd.nextInt(2))(ids(rnd.nextInt(ids.length))).distinct
      val op = rnd.nextInt(6)
      op match {
        case 0 | 1 => idx.add(1, docsOf(pick)); model ++= pick
        case 2 => idx.remove(1, pick); model --= pick
        case 3 => idx.removeDeferred(1, pick); model --= pick
        case 4 => idx.compact()
        case 5 => idx.update(1, docsOf(pick)); model ++= pick
      }
      assert(allVisible() == model, s"step $step (op $op on $pick) diverged")
    }
    idx.compact()
    assert(allVisible() == model, "final compact diverged")
  }
}
