package graft

import graft.core._
import graft.index.IndexIVF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reader-vs-maintenance isolation contract (IndexIVF class
  * scaladoc; VERDICT r8 #7): maintenance directory swaps give concurrent
  * readers NO snapshot — a DataFrame handle created before [[IndexIVF
  * .compactFiles]]/[[IndexIVF.compact]] holds the pre-swap file listing and
  * must fail LOUDLY (FileNotFoundException surfaced through the Spark task
  * failure), never silently return partial rows; a handle created after the
  * swap sees the complete post-maintenance table. The reference gets reader
  * isolation for free from RocksDB snapshots; Parquet-on-a-filesystem makes
  * it an explicit stop-the-world-or-retry contract, and this spec is what
  * keeps the failure mode a documented behavior instead of a surprise. */
class MaintenanceIsolationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 8
  private val rnd = new scala.util.Random(17)

  private def mkDocs(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      (i.toLong, Seq.fill(3)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    }.toDF("id", "colbert")
  }

  private def freshIndex(): IndexIVF = {
    val path = java.nio.file.Files.createTempDirectory("idx_maint_iso").toString
    val schema = GSchema(Seq(GField.colbert("colbert", dim, numCentroids = 4,
      quantization = QuantizerKind.NONE, numIterations = 2, nbits = 2)))
    val idx = IndexIVF.create(spark, path, schema)
    idx.train(mkDocs(0 until 12))
    idx
  }

  private def hasFileNotFound(t: Throwable): Boolean = {
    var cur = t
    var seen = Set.empty[Throwable]
    while (cur != null && !seen(cur)) {
      if (cur.isInstanceOf[java.io.FileNotFoundException]) return true
      seen += cur
      cur = cur.getCause
    }
    // Spark sometimes flattens the cause into the message (task failure
    // serialization); accept that spelling of the same loud failure
    t.getMessage != null && t.getMessage.contains("FileNotFoundException")
  }

  test("pre-swap reader handle fails loudly after compactFiles; fresh handle recovers") {
    val idx = freshIndex()
    // two adds -> at least one postings partition dir holds 2 files, so
    // compactFiles(1) must rewrite (and therefore swap) that directory
    idx.add(1, mkDocs(0 until 12))
    idx.add(1, mkDocs(12 until 24))
    val before = idx.postingsDf.count()
    assert(before > 0)

    // the reader handle under test: listing captured NOW, executed later
    val stale = idx.postingsDf
    idx.compactFiles(maxFiles = 1)

    // loud half: the pre-swap listing points at files the swap deleted.
    // ignoreMissingFiles must be at its false default for this index's
    // session or the same race would silently DROP rows instead.
    assert(spark.conf.get("spark.sql.files.ignoreMissingFiles") == "false")
    val failure = intercept[Exception] { stale.count() }
    assert(hasFileNotFound(failure),
      s"stale reader should surface FileNotFoundException, got: $failure")

    // recovery half: a handle created after maintenance sees every row
    assert(idx.postingsDf.count() == before,
      "post-maintenance fresh handle must see the complete table")
  }

  test("pre-swap reader handle fails loudly across compact(); fresh handle sees the delete") {
    val idx = freshIndex()
    idx.add(1, mkDocs(0 until 24))
    val before = idx.postingsDf.count()
    val victimRows = idx.postingsDf.filter(col("doc_id").isin(3L, 7L)).count()
    assert(victimRows > 0)
    val stale = idx.postingsDf
    idx.removeDeferred(1, Seq(3L, 7L))
    idx.compact()
    val failure = intercept[Exception] { stale.count() }
    assert(hasFileNotFound(failure),
      s"stale reader should surface FileNotFoundException, got: $failure")
    assert(idx.postingsDf.count() == before - victimRows)
    assert(idx.postingsDf.filter(col("doc_id").isin(3L, 7L)).count() == 0)
  }
}
