package graft

import graft.core._
import graft.index.IndexIVF
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Crash-ordering pin for the floor-before-discharge rule in
  * IndexIVF.compact() and remove(): physically applying deletes, raising the
  * history floor, and discharging tombstones span several filesystem steps
  * that cannot be atomic, so the ONLY sound crash window is the conservative
  * one — floor already raised, tombstones still on disk (masking rows that
  * are already physically gone: a no-op). The reverse order had an unsound
  * window: tombstones discharged but floor not yet raised, so
  * openAt(pre-compact epoch) silently served the compacted tables with the
  * victims missing. These tests synthesize the post-fix crash state by
  * restoring a saved tombstones dir AFTER the operation completes and assert
  * reads stay correct, stale snapshots stay refused, re-adds are not hidden,
  * and the next compact() discharges idempotently. */
class TombstoneOrderingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = GSchema(Seq(
    GField.indexedStored("val", GDataType.INTEGER),
    GField.stored("body", GDataType.TEXT)))

  private def docsFor(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, i * 10, s"doc-$i")).toDF("id", "val", "body")
  }

  private def visibleDocs(idx: IndexIVF): Set[Long] =
    idx.docsDf.filter(col("tenant") === 1)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet

  private def copyTree(src: Path, dst: Path): Unit = {
    val walk = Files.walk(src)
    try walk.iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    } finally walk.close()
  }

  test("compact(): the floor-raised-but-undischarged crash state is conservative") {
    val path = Files.createTempDirectory("idx_tomb_ord").toString
    val idx = IndexIVF.create(spark, path, schema)
    idx.add(1, docsFor(Seq(1L, 2L, 3L, 4L)))
    idx.removeDeferred(1, Seq(2L))
    val saved = Files.createTempDirectory("idx_tomb_saved")
    copyTree(Paths.get(s"$path/tombstones"), saved)

    idx.compact()
    val floor = idx.historyFloor()
    assert(floor > 0, "compact must raise the floor")
    assert(visibleDocs(idx) == Set(1L, 3L, 4L))

    // crash simulation: floor raised, tombstones back on disk (the only
    // window the floor-before-discharge ordering can leave behind)
    copyTree(saved, Paths.get(s"$path/tombstones"))
    val idx2 = IndexIVF.open(spark, path)
    assert(visibleDocs(idx2) == Set(1L, 3L, 4L),
      "a leftover tombstone over already-compacted rows must be a no-op mask")
    // stale snapshots refused (this is the soundness half: had the floor
    // NOT been raised before the crash, this openAt would serve doc 2's
    // epoch with doc 2 physically missing)
    val e = intercept[IllegalArgumentException](
      IndexIVF.openAt(spark, path, floor - 1))
    assert(e.getMessage.contains("history floor"))
    IndexIVF.openAt(spark, path, floor) // at-floor snapshot still opens

    // recovery: the next compact discharges and re-raises idempotently
    idx2.compact()
    assert(!Files.exists(Paths.get(s"$path/tombstones")),
      "recovery compact must discharge the leftover tombstones")
    assert(idx2.historyFloor() >= floor)
    assert(visibleDocs(idx2) == Set(1L, 3L, 4L))
  }

  test("remove(): a leftover safety tombstone never hides a later re-add") {
    val path = Files.createTempDirectory("idx_tomb_ord_rm").toString
    val idx = IndexIVF.create(spark, path, schema)
    idx.add(1, docsFor(Seq(1L, 2L, 3L)))
    // stage a stamped tombstone for doc 2 (what remove()'s safety tombstone
    // looks like mid-flight), snapshot it, then let remove() run to
    // completion — it discharges everything and raises the floor
    idx.removeDeferred(1, Seq(2L))
    val saved = Files.createTempDirectory("idx_tomb_saved_rm")
    copyTree(Paths.get(s"$path/tombstones"), saved)
    idx.remove(1, Seq(2L))
    val floor = idx.historyFloor()
    assert(floor > 0, "remove must raise the floor")
    assert(visibleDocs(idx) == Set(1L, 3L))

    // crash simulation: the discharge never happened
    copyTree(saved, Paths.get(s"$path/tombstones"))
    val idx2 = IndexIVF.open(spark, path)
    assert(visibleDocs(idx2) == Set(1L, 3L))

    // the epoch-stamped leftover kills only rows at or before its own
    // epoch: a re-add (= update()'s second half) lands at a later epoch
    // and must be visible through the mask AND survive the next compact
    idx2.add(1, docsFor(Seq(2L)))
    assert(visibleDocs(idx2) == Set(1L, 2L, 3L),
      "a leftover stamped tombstone must not hide a later re-add")
    idx2.compact()
    assert(visibleDocs(idx2) == Set(1L, 2L, 3L),
      "compact must not destroy the re-added doc")
    assert(!Files.exists(Paths.get(s"$path/tombstones")))
  }
}
