package graft

import graft.core._
import graft.index.IndexIVF
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** v2 → v3 migration interop: a pre-epoch index (files WITHOUT the epoch
  * column, format version 2) must migrate metadata-only and then behave
  * correctly under the epoch-stamped tombstone machinery — null epochs
  * coalesce to "killable by any tombstone", re-adds land with real epochs
  * above every tombstone, and a compact over the MIXED table (pre-epoch +
  * post-epoch files in one directory) kills exactly the old rows. This is
  * the upgrade path every existing index takes after the round-8 format
  * bump. */
class IndexMigrationV2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = GSchema(Seq(
    GField.indexedStored("val", GDataType.INTEGER),
    GField.stored("body", GDataType.TEXT)))

  private def docsFor(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, i * 10, s"doc-$i")).toDF("id", "val", "body")
  }

  private def visible(idx: IndexIVF): Set[Long] =
    idx.docsDf.filter(col("tenant") === 1).select("doc_id")
      .distinct().collect().map(_.getLong(0)).toSet

  test("v2 pre-epoch index migrates metadata-only and interops with epoch tombstones") {
    val path = java.nio.file.Files.createTempDirectory("idx_v2").toString
    val idx = IndexIVF.create(spark, path, schema)
    idx.add(tenant = 1, docsFor(Seq(0L, 1L, 2L, 3L)))

    // simulate a v2 index: strip the epoch column from every data file and
    // stamp the metadata back to version 2 (what an index written by the
    // previous format actually contains)
    val conf = spark.sparkContext.hadoopConfiguration
    Seq("docs" -> Seq("tenant"), "scalars" -> Seq("tenant", "field")).foreach {
      case (tbl, parts) =>
        val tablePath = s"$path/$tbl"
        val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tablePath), conf)
        if (fs.exists(new org.apache.hadoop.fs.Path(tablePath))) {
          val stripped = spark.read.parquet(tablePath).drop("epoch")
          val tmp = new org.apache.hadoop.fs.Path(tablePath + ".v2tmp")
          stripped.write.mode("overwrite").partitionBy(parts: _*).parquet(tmp.toString)
          fs.delete(new org.apache.hadoop.fs.Path(tablePath), true)
          fs.rename(tmp, new org.apache.hadoop.fs.Path(tablePath))
        }
    }
    new java.io.File(s"$path/_meta/epoch.json").delete()
    Json.write(s"$path/_meta/metadata.json",
      Map("format" -> "graft-ivf-parquet", "version" -> 2,
        "layout" -> "postings/tenant/field/centroid_bucket"))

    // open() refuses the old version; migrate() is metadata-only for v2
    intercept[IllegalStateException](IndexIVF.open(spark, path))
    IndexIVF.migrate(spark, path)
    IndexIVF.migrate(spark, path) // idempotent
    val re = IndexIVF.open(spark, path)
    assert(visible(re) == Set(0L, 1L, 2L, 3L), "pre-epoch rows all visible")

    // a deferred delete hides pre-epoch rows (null epoch => killable by any
    // tombstone), and a re-add lands ABOVE the tombstone and stays visible
    re.removeDeferred(1, Seq(1L, 2L))
    assert(visible(re) == Set(0L, 3L))
    re.add(1, docsFor(Seq(1L)))
    assert(visible(re) == Set(0L, 1L, 3L),
      "re-added doc visible over the pending tombstone despite pre-epoch files")

    // compact over the MIXED directory (pre-epoch + epoch-stamped files):
    // kills doc 2 and doc 1's OLD rows only; the re-add survives physically
    re.compact()
    assert(visible(re) == Set(0L, 1L, 3L), "compact preserved the re-add")
    val rows1 = re.docsDf.filter(col("tenant") === 1 && col("doc_id") === 1L).count()
    assert(rows1 == 1L, s"doc 1 should have exactly its re-added row, got $rows1")
    assert(re.docsDf.filter(col("tenant") === 1 && col("doc_id") === 2L).isEmpty,
      "doc 2 physically gone")
  }
}
