package graft

import graft.core._
import graft.index.IndexIVF
import graft.query._
import org.scalatest.funsuite.AnyFunSuite

case class JDoc(id: Long, colbert: Seq[Seq[Float]], cat: String, num: Long)

/** Crash atomicity of multi-table writes (the write-ahead journal).
  *
  * The reference writes a doc's postings/context/docs/scalars rows in one
  * RocksDB WriteBatch, so a crash never exposes a half-added document; here
  * each table is its own Spark job commit, and `_meta/pending.json` +
  * epoch vacuum restore the same all-or-nothing contract. These tests drive
  * both recovery paths: at [[IndexIVF.open]] (previous writer died — the
  * journal entry is still on disk) and eagerly in-process (a write job
  * failed mid-add).
  */
class JournalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val dim = 8
  val rnd = new scala.util.Random(7)

  def tokens(): Seq[Seq[Float]] =
    Seq.fill(3)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))

  def mkDocs(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => JDoc(i, tokens(), if (i % 2 == 0) "even" else "odd", i)).toDF()
  }

  def mkIndex(): (IndexIVF, String) = {
    val path = java.nio.file.Files.createTempDirectory("journal_idx").toString
    val schema = GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 4,
        quantization = QuantizerKind.NONE, numIterations = 2, nbits = 2),
      GField(name = "cat", dataType = GDataType.TEXT.toString,
        roles = Seq(FieldRole.Indexed.toString, FieldRole.Stored.toString)),
      GField.indexed("num", GDataType.INTEGER)))
    val idx = IndexIVF.create(spark, path, schema)
    val base = mkDocs(0L until 8L)
    idx.train(base)
    idx.add(1, base)
    (idx, path)
  }

  def epochOf(path: String): Long =
    Json.read(s"$path/_meta/epoch.json", classOf[Map[String, Any]])("epoch")
      .asInstanceOf[Number].longValue()

  def allTableRows(idx: IndexIVF): Map[String, Long] = Map(
    "postings" -> idx.postingsDf.count(),
    "scalars" -> idx.scalarsDf.count(),
    "context" -> idx.contextDf.count(),
    "docs" -> idx.docsDf.count())

  test("open() vacuums a torn multi-table add recorded in the journal") {
    val (idx, path) = mkIndex()
    val before = allTableRows(idx)
    // a fully-committed second add plays the torn write: re-instating its
    // journal entry afterwards is byte-identical on disk to a writer that
    // died AFTER every table job committed but BEFORE clearing the journal
    // (and any earlier die point just leaves a subset of these rows for the
    // same vacuum). Recovery must remove every row of that epoch.
    idx.add(1, mkDocs(100L until 104L))
    val tornEpoch = epochOf(path)
    assert(allTableRows(idx) != before, "second add visibly landed")
    Json.write(s"$path/_meta/pending.json",
      Map("op" -> "add", "epoch" -> tornEpoch))

    val reopened = IndexIVF.open(spark, path)
    assert(!Json.exists(s"$path/_meta/pending.json"), "journal cleared")
    assert(allTableRows(reopened) == before,
      "every table back to its pre-torn-write state")
    // the vacuumed ids are gone from search results too
    val hits = reopened.search(1,
      TermQuery("num", 101L), k = 10, SearchOptions()).collect()
    assert(hits.isEmpty, "torn doc is not searchable after recovery")
    // and a fresh open with no journal entry is a no-op
    assert(IndexIVF.open(spark, path).recoverPending().isEmpty)
  }

  test("a failed add() vacuums its own epoch eagerly and leaves no journal") {
    val (idx, path) = mkIndex()
    val before = allTableRows(idx)
    val beforeEpoch = epochOf(path)
    // one doc with a wrong-dim token: the encode UDF fails DURING the write
    // jobs, after some lanes (docs/scalars) may already have committed
    import spark.implicits._
    val bad = Seq(
      JDoc(200L, tokens(), "even", 200L),
      JDoc(201L, Seq(Seq.fill(dim + 3)(0.1f)), "odd", 201L)).toDF()
    val e = intercept[Exception] { idx.add(1, bad) }
    assert(e.getMessage != null)
    assert(!Json.exists(s"$path/_meta/pending.json"),
      "journal cleared after eager recovery")
    assert(allTableRows(idx) == before,
      "every table back to its pre-failure state (partial lanes vacuumed)")
    assert(epochOf(path) == beforeEpoch + 1, "epoch advanced (and burned)")
    // the index stays fully writable and searchable after the rollback
    idx.add(1, mkDocs(300L until 302L))
    val hits = idx.search(1, TermQuery("num", 300L), k = 10, SearchOptions())
      .collect()
    assert(hits.map(_.getAs[Long]("doc_id")).toSeq == Seq(300L))
  }

  test("open() vacuums a torn removeDeferred (tombstone table journal)") {
    val (idx, path) = mkIndex()
    idx.removeDeferred(1, Seq(3L))
    val tornEpoch = epochOf(path)
    Json.write(s"$path/_meta/pending.json",
      Map("op" -> "removeDeferred", "epoch" -> tornEpoch))
    val reopened = IndexIVF.open(spark, path)
    assert(!Json.exists(s"$path/_meta/pending.json"))
    // the tombstone was vacuumed: doc 3 is still alive
    val hits = reopened.search(1, TermQuery("num", 3L), k = 10, SearchOptions())
      .collect()
    assert(hits.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L))
  }

  def fileBytes(p: String): Seq[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq

  test("train() is journaled two-phase: a completed train leaves current == " +
      "stamp; torn phase A rolls back; torn phase B rolls forward") {
    val (idx, path) = mkIndex()
    // a completed train leaves no journal, and current files are byte-equal
    // to the newest stamp (phase B is a file copy of phase A's output)
    assert(!Json.exists(s"$path/_meta/pending.json"))
    val e1 = epochOf(path) - 1 // mkIndex: train then add -> train is cur-1
    assert(fileBytes(s"$path/_meta/colbert.centroids.json") ==
      fileBytes(s"$path/_meta/history/$e1/colbert.centroids.json"))
    val goodCentroids = fileBytes(s"$path/_meta/colbert.centroids.json")

    // ---- torn PHASE A (writer died before the stamp completed): a
    // partial stamp dir + a journal without the stamped flag. Recovery
    // must delete the partial stamp and leave current untouched.
    val tornA = epochOf(path) + 1
    Json.write(s"$path/_meta/epoch.json", Map("epoch" -> tornA))
    val stampA = java.nio.file.Paths.get(s"$path/_meta/history/$tornA")
    java.nio.file.Files.createDirectories(stampA)
    java.nio.file.Files.write(stampA.resolve("colbert.centroids.json"),
      "{\"partial\": true}".getBytes("UTF-8"))
    Json.write(s"$path/_meta/pending.json", Map("op" -> "train", "epoch" -> tornA))
    // openAt refuses while the journal is pending
    intercept[IllegalArgumentException](IndexIVF.openAt(spark, path, e1))
    val rec1 = IndexIVF.open(spark, path)
    assert(!Json.exists(s"$path/_meta/pending.json"))
    assert(!java.nio.file.Files.exists(stampA), "partial stamp must be rolled back")
    assert(fileBytes(s"$path/_meta/colbert.centroids.json") == goodCentroids,
      "current model must be untouched by a phase-A rollback")
    assert(rec1.search(1, TermQuery("num", 3L), k = 10, SearchOptions())
      .collect().nonEmpty)

    // ---- torn PHASE B (stamp completed, writer died copying it over the
    // current files): journal carries stamped=true, current diverges from
    // the stamp. Recovery must roll FORWARD — current becomes the stamp.
    val tornB = epochOf(path) + 1
    Json.write(s"$path/_meta/epoch.json", Map("epoch" -> tornB))
    val stampB = java.nio.file.Paths.get(s"$path/_meta/history/$tornB")
    java.nio.file.Files.createDirectories(stampB)
    // the "retrained" model: the old centroids with one value shifted —
    // any valid, loadable centroids JSON that differs byte-wise works
    val retrained = new String(goodCentroids.toArray, "UTF-8")
      .replaceFirst("\\[\\[", "[[") // no-op edit keeps JSON valid
    java.nio.file.Files.write(stampB.resolve("colbert.centroids.json"),
      (retrained + " ").getBytes("UTF-8")) // trailing space: byte-different, JSON-same
    Json.write(s"$path/_meta/pending.json",
      Map("op" -> "train", "epoch" -> tornB, "stamped" -> true))
    val rec2 = IndexIVF.open(spark, path)
    assert(!Json.exists(s"$path/_meta/pending.json"))
    assert(fileBytes(s"$path/_meta/colbert.centroids.json") ==
      fileBytes(s"$path/_meta/history/$tornB/colbert.centroids.json"),
      "phase-B recovery must make current byte-equal to the completed stamp")
    assert(rec2.search(1, TermQuery("num", 3L), k = 10, SearchOptions())
      .collect().nonEmpty)
  }

  test("an in-process write op never clobbers a pending train journal: " +
      "it rolls the torn phase B forward first") {
    val (idx, path) = mkIndex()
    val goodCentroids = fileBytes(s"$path/_meta/colbert.centroids.json")
    // fabricate the torn-phase-B state under a LIVE handle (the writer
    // whose train() failed mid-copy but whose exception the caller caught):
    // a completed stamp that differs byte-wise from current + the
    // stamped=true journal entry
    val tornB = epochOf(path) + 1
    Json.write(s"$path/_meta/epoch.json", Map("epoch" -> tornB))
    val stampB = java.nio.file.Paths.get(s"$path/_meta/history/$tornB")
    java.nio.file.Files.createDirectories(stampB)
    java.nio.file.Files.write(stampB.resolve("colbert.centroids.json"),
      (new String(goodCentroids.toArray, "UTF-8") + " ").getBytes("UTF-8"))
    Json.write(s"$path/_meta/pending.json",
      Map("op" -> "train", "epoch" -> tornB, "stamped" -> true))
    // the next journaled op on the SAME handle must recover (roll forward)
    // before writing its own journal entry — overwriting it would strand
    // the divergent current files forever with no error
    idx.add(1, mkDocs(Seq(100L)))
    assert(!Json.exists(s"$path/_meta/pending.json"))
    assert(fileBytes(s"$path/_meta/colbert.centroids.json") ==
      fileBytes(s"$path/_meta/history/$tornB/colbert.centroids.json"),
      "the pending train must be rolled forward, not clobbered, by add()")
    assert(idx.search(1, TermQuery("num", 100L), k = 10, SearchOptions())
      .collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(100L))
  }

  test("open() recovers a torn phase B whose current model file is " +
      "truncated — recovery runs BEFORE any model parse") {
    val (_, path) = mkIndex()
    val goodCentroids = fileBytes(s"$path/_meta/colbert.centroids.json")
    val tornB = epochOf(path) + 1
    Json.write(s"$path/_meta/epoch.json", Map("epoch" -> tornB))
    val stampB = java.nio.file.Paths.get(s"$path/_meta/history/$tornB")
    java.nio.file.Files.createDirectories(stampB)
    java.nio.file.Files.write(stampB.resolve("colbert.centroids.json"),
      (new String(goodCentroids.toArray, "UTF-8") + " ").getBytes("UTF-8"))
    // the writer died MID-copy: the current file is half-written garbage.
    // A model load before recovery would throw on the truncated JSON and
    // brick the index (openAt also refuses while the journal is pending).
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_meta/colbert.centroids.json"),
      "{\"centroids\": [[0.1, ".getBytes("UTF-8"))
    Json.write(s"$path/_meta/pending.json",
      Map("op" -> "train", "epoch" -> tornB, "stamped" -> true))
    val rec = IndexIVF.open(spark, path)
    assert(!Json.exists(s"$path/_meta/pending.json"))
    assert(fileBytes(s"$path/_meta/colbert.centroids.json") ==
      fileBytes(s"$path/_meta/history/$tornB/colbert.centroids.json"),
      "recovery must repair the truncated current file from the stamp " +
        "before the model is parsed")
    assert(rec.search(1, TermQuery("num", 3L), k = 10, SearchOptions())
      .collect().nonEmpty)
  }

  test("open() vacuums a torn merge: both indexes stay readable and the " +
      "merge re-runs idempotently from the recovered state") {
    val (idx, path) = mkIndex()
    val before = allTableRows(idx)
    // the mergeable twin comes from the clone flow (shared trained model —
    // the fingerprint guard's precondition), with its own docs to import
    val other = IndexIVF.copyTrained(idx,
      java.nio.file.Files.createTempDirectory("journal_merge_other").toString)
    other.add(1, mkDocs(100L until 104L))
    val otherBefore = allTableRows(other)
    // a fully-committed merge plays the torn write (same construction as
    // the torn-add case: re-instating the journal entry is byte-identical
    // on disk to a writer that died after every table job committed but
    // before clearing the journal; any earlier die point leaves a subset
    // of these rows for the same epoch vacuum)
    idx.merge(other.path)
    val tornEpoch = epochOf(path)
    val merged = allTableRows(idx)
    assert(merged != before, "merge visibly landed")
    Json.write(s"$path/_meta/pending.json",
      Map("op" -> "merge", "epoch" -> tornEpoch))

    val reopened = IndexIVF.open(spark, path)
    assert(!Json.exists(s"$path/_meta/pending.json"), "journal cleared")
    assert(allTableRows(reopened) == before,
      "every table back to its pre-merge state (imported rows vacuumed)")
    assert(reopened.search(1, TermQuery("num", 101L), k = 10, SearchOptions())
      .collect().isEmpty, "imported doc is not searchable after recovery")
    // recovery vacuums the LOCAL epoch only — the other index is read-only
    // to merge and must be untouched by the rollback
    assert(allTableRows(other) == otherBefore,
      "the merge source must be untouched by recovery")
    assert(other.search(1, TermQuery("num", 101L), k = 10, SearchOptions())
      .collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(101L))
    // the merge re-runs cleanly from the recovered state and lands the
    // same table shape as the uninterrupted run
    reopened.merge(other.path)
    assert(allTableRows(reopened) == merged,
      "re-run merge must reproduce the uninterrupted merge's table counts")
    assert(reopened.search(1, TermQuery("num", 101L), k = 10, SearchOptions())
      .collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(101L))
  }

  test("a crash after merge's pre-compact (before the journaled union) " +
      "leaves a consistent index from which merge re-runs correctly") {
    // merge's multi-step pre-sequence is: compact-if-tombstones -> read the
    // other side (applying ITS tombstones) -> re-stamp -> journaled union.
    // A tear after the pre-compact leaves NO journal entry — the on-disk
    // state is exactly a completed compact(), which must itself be a
    // consistent, merge-ready state. Synthesize it directly.
    val (idx, path) = mkIndex()
    idx.removeDeferred(1, Seq(3L))
    idx.compact() // == the state a crash right after merge's pre-compact leaves
    assert(!Json.exists(s"$path/_meta/pending.json"),
      "the pre-compact window carries no journal entry")
    val reopened = IndexIVF.open(spark, path)
    assert(reopened.search(1, TermQuery("num", 3L), k = 10, SearchOptions())
      .collect().isEmpty, "tombstoned doc stays dead after the pre-compact tear")
    val other = IndexIVF.copyTrained(reopened,
      java.nio.file.Files.createTempDirectory("journal_merge_pc").toString)
    other.add(1, mkDocs(200L until 203L))
    reopened.merge(other.path)
    val got = (0L until 8L) ++ (200L until 203L)
    got.filterNot(_ == 3L).foreach { id =>
      assert(reopened.search(1, TermQuery("num", id), k = 10, SearchOptions())
        .collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(id),
        s"doc $id must be present after the re-run merge")
    }
    assert(reopened.search(1, TermQuery("num", 3L), k = 10, SearchOptions())
      .collect().isEmpty, "the pre-merge tombstone victim must stay dead")
  }

  test("open() on an unparseable journal fails loudly naming the file and vacuums NOTHING") {
    val (idx, path) = mkIndex()
    val before = allTableRows(idx)
    // Json.write is atomic (write-temp-fsync-rename, Json.scala), so a torn
    // pending.json can only come from external corruption — recovery must
    // refuse to guess: an "unparseable -> assume torn add -> vacuum" policy
    // could destroy committed rows of whatever epoch the garbage decoded to
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_meta/pending.json"),
      """{"op": "add", "epo""".getBytes("UTF-8")) // truncated mid-key
    val e = intercept[IllegalStateException](IndexIVF.open(spark, path))
    assert(e.getMessage.contains("pending.json"),
      s"error must name the journal file, got: ${e.getMessage}")
    assert(e.getMessage.toLowerCase.contains("not parseable"),
      s"error must state the failure mode, got: ${e.getMessage}")
    assert(Json.exists(s"$path/_meta/pending.json"),
      "the corrupt journal must be left in place for manual inspection")
    // operator inspects + removes the file -> open works and no row was lost
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$path/_meta/pending.json"))
    val reopened = IndexIVF.open(spark, path)
    assert(allTableRows(reopened) == before,
      "refusal must not have vacuumed any committed rows")
  }

  test("open() on a journal naming an unrecognized op refuses to vacuum") {
    val (idx, path) = mkIndex()
    val before = allTableRows(idx)
    // parseable, carries an epoch — but an op this version doesn't know.
    // A newer writer may journal new op kinds whose recovery this version
    // can't perform; vacuuming that epoch's rows would be data loss.
    Json.write(s"$path/_meta/pending.json",
      Map("op" -> "rebalance", "epoch" -> epochOf(path)))
    val e = intercept[IllegalArgumentException](IndexIVF.open(spark, path))
    assert(e.getMessage.contains("pending.json") &&
      e.getMessage.contains("rebalance"),
      s"error must name the file and the op, got: ${e.getMessage}")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$path/_meta/pending.json"))
    assert(allTableRows(IndexIVF.open(spark, path)) == before)
  }

  test("a failed train() rolls the in-memory model back with the disk state") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("journal_idx_mem").toString
    val schema = GSchema(Seq(
      GField.colbert("vecA", dim, numCentroids = 4,
        quantization = QuantizerKind.NONE, numIterations = 2, nbits = 2),
      GField.colbert("vecB", dim, numCentroids = 4,
        quantization = QuantizerKind.NONE, numIterations = 2, nbits = 2)))
    val idx = IndexIVF.create(spark, path, schema)
    // vecA trains fine (and mutates the in-memory maps mid-body); vecB's
    // column is missing, so its train throws AFTER that mutation
    val partial = (0L until 8L).map(i => (i, tokens())).toDF("id", "vecA")
    val e = intercept[Exception](idx.train(partial))
    assert(!Json.exists(s"$path/_meta/pending.json"),
      "rollback must clear the journal")
    assert(idx.coarse.isEmpty && idx.quantizers.isEmpty,
      s"in-memory model must roll back with the disk rollback, got " +
        s"coarse=${idx.coarse.keySet} quantizers=${idx.quantizers.keySet} " +
        s"(train failed with: ${e.getMessage})")
    // the handle stays usable: a correct retry trains both fields cleanly
    val full = (0L until 8L).map(i => (i, tokens(), tokens()))
      .toDF("id", "vecA", "vecB")
    idx.train(full)
    assert(idx.coarse.keySet == Set("vecA", "vecB"))
    assert(fileBytes(s"$path/_meta/vecA.centroids.json").nonEmpty)
  }

  test("forward-compat pin: EVERY op in JournaledOps has a working recovery " +
      "branch (synthesized journal per op)") {
    // the unknown-op refusal (r16) is one half of the contract; this is the
    // other: an op added to JournaledOps without a recovery path that
    // actually executes fails HERE, so the set and recoverPending's match
    // can never drift apart. Each op gets a fresh index with a synthesized
    // journal at a burned epoch (no rows carry it — recovery must still
    // run, clear the journal, and leave every committed row intact).
    assert(IndexIVF.JournaledOps ==
      Set("train", "add", "remove", "removeDeferred", "merge"),
      "JournaledOps changed — extend recoverPending AND this spec's " +
        "per-op journal synthesis (op-specific fields, die points) before " +
        "updating the pinned set")
    IndexIVF.JournaledOps.foreach { op =>
      val (idx, path) = mkIndex()
      val before = allTableRows(idx)
      val tornEpoch = epochOf(path) + 1
      // train journals carry a phase flag; synthesize the pre-stamp phase
      // (rollback: current model files untouched). Row ops synthesize the
      // op + epoch shape their journaled() writes.
      val entry: Map[String, Any] =
        if (op == "train") Map("op" -> op, "epoch" -> tornEpoch, "stamped" -> false)
        else Map("op" -> op, "epoch" -> tornEpoch)
      Json.write(s"$path/_meta/pending.json", entry)
      val reopened = IndexIVF.open(spark, path)
      assert(!Json.exists(s"$path/_meta/pending.json"),
        s"op '$op': journal must be cleared by recovery")
      assert(allTableRows(reopened) == before,
        s"op '$op': committed rows must survive recovering a torn epoch " +
          "that wrote nothing")
      // the recovered index stays writable
      reopened.add(1, mkDocs(Seq(900L)))
      assert(reopened.search(1, TermQuery("num", 900L), k = 5, SearchOptions())
        .collect().nonEmpty, s"op '$op': index must stay usable after recovery")
    }
  }
}
