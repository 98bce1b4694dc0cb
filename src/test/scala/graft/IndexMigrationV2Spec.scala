package graft

import graft.core._
import graft.index.IndexIVF
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Migration interop across the format history. v2 → v4: a pre-epoch index
  * (files WITHOUT the epoch column, docs WITHOUT the bucket level, format
  * version 2) must migrate — one docs/ clustering rewrite plus metadata —
  * and then behave correctly under the epoch-stamped tombstone machinery:
  * null epochs coalesce to "killable by any tombstone", re-adds land with
  * real epochs above every tombstone, and a compact over the MIXED table
  * (pre-epoch + post-epoch files in one directory) kills exactly the old
  * rows. v3 → v4: an epoch-stamped index lacking only the docs bucket
  * level migrates with the docs rewrite alone and searches identically.
  * These are the upgrade paths every existing index takes after the
  * round-8 (epoch) and round-9 (doc_bucket) format bumps. */
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

  /** Collapse the v4 bucket hive levels (docs doc_bucket, scalars
    * value_bucket) and optionally the epoch column back to the pre-v4
    * layout — what an index written by an older format actually contains
    * on disk. */
  private def stripDocsTo(path: String, dropEpoch: Boolean): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    Seq("docs" -> Seq("tenant"), "scalars" -> Seq("tenant", "field")).foreach {
      case (tbl, parts) =>
        val tablePath = s"$path/$tbl"
        val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(tablePath), conf)
        if (fs.exists(new org.apache.hadoop.fs.Path(tablePath))) {
          val read = spark.read.parquet(tablePath)
          val stripped0 = read.drop("doc_bucket", "value_bucket")
          val stripped = if (dropEpoch) stripped0.drop("epoch") else stripped0
          val tmp = new org.apache.hadoop.fs.Path(tablePath + ".oldtmp")
          stripped.write.mode("overwrite").partitionBy(parts: _*).parquet(tmp.toString)
          fs.delete(new org.apache.hadoop.fs.Path(tablePath), true)
          fs.rename(tmp, new org.apache.hadoop.fs.Path(tablePath))
        }
    }
  }

  test("v2 pre-epoch index migrates and interops with epoch tombstones") {
    val path = java.nio.file.Files.createTempDirectory("idx_v2").toString
    val idx = IndexIVF.create(spark, path, schema)
    idx.add(tenant = 1, docsFor(Seq(0L, 1L, 2L, 3L)))

    // simulate a v2 index: strip the epoch column from every data file,
    // collapse the docs bucket level, stamp the metadata back to version 2
    stripDocsTo(path, dropEpoch = true)
    new java.io.File(s"$path/_meta/epoch.json").delete()
    Json.write(s"$path/_meta/metadata.json",
      Map("format" -> "graft-ivf-parquet", "version" -> 2,
        "layout" -> "postings/tenant/field/centroid_bucket"))

    // open() refuses the old version; migrate() rewrites docs/ (bucket
    // level) — the epoch half of the upgrade stays metadata-only
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

  test("v3 index (no docs bucket level) migrates via the docs rewrite alone") {
    val path = java.nio.file.Files.createTempDirectory("idx_v3").toString
    val idx = IndexIVF.create(spark, path, schema)
    idx.add(tenant = 1, docsFor(Seq(0L, 1L, 2L, 65L)))
    val before = idx.docsDf.filter(col("tenant") === 1)
      .select("doc_id", "val", "body").collect().map(_.toSeq).toSet

    // simulate v3: collapse the docs bucket level, keep epochs, stamp v3
    stripDocsTo(path, dropEpoch = false)
    Json.write(s"$path/_meta/metadata.json",
      Map("format" -> "graft-ivf-parquet", "version" -> 3,
        "layout" -> "postings/tenant/field/centroid_bucket"))

    intercept[IllegalStateException](IndexIVF.open(spark, path))
    IndexIVF.migrate(spark, path)
    val re = IndexIVF.open(spark, path)
    val after = re.docsDf.filter(col("tenant") === 1)
      .select("doc_id", "val", "body").collect().map(_.toSeq).toSet
    assert(after == before, "docs content unchanged by the layout rewrite")

    // the rewrite produced the real hive level (doc 65 shares bucket 1
    // with doc 1 under DocBuckets=64 — floorMod, one dir per bucket)
    val dirs = new java.io.File(s"$path/docs/tenant=1").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val want = Set(0L, 1L, 2L, 65L).map(id =>
      s"doc_bucket=${IndexIVF.docBucketOf(id)}")
    assert(dirs == want, s"expected bucket dirs $want, got $dirs")

    // scalars got its value_bucket level in the same migrate, and the
    // bucket a term probe computes matches the directory the row landed in
    val sDirs = new java.io.File(s"$path/scalars/tenant=1/field=0").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val sWant = Set(0L, 1L, 2L, 65L).map(id =>
      s"value_bucket=${IndexIVF.valueBucketOf((id * 10).toString)}")
    assert(sDirs == sWant, s"expected scalar bucket dirs $sWant, got $sDirs")
  }

  test("v4 index (no context bucket level) migrates via the context rewrite alone") {
    import graft.query._
    val dim = 8
    val rnd = new scala.util.Random(7)
    val tensorSchema = GSchema(Seq(
      GField.colbert("colbert", dim, numCentroids = 4, numIterations = 3),
      GField.stored("cat", GDataType.TEXT)))
    def tensorDocs(ids: Seq[Long]) = {
      import spark.implicits._
      ids.map(i => Doc(i, Seq.fill(3)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)),
        s"doc-$i", 0L)).toDF()
        .select(col("id"), col("colbert"), col("cat"))
    }
    val path = java.nio.file.Files.createTempDirectory("idx_v4").toString
    val idx = IndexIVF.create(spark, path, tensorSchema)
    val docs = tensorDocs(Seq(0L, 1L, 2L, 65L))
    idx.train(docs.select(col("id"), col("colbert")))
    idx.add(1, docs)
    val query = VectorQuery("colbert",
      Array.fill(2)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    def results(i: IndexIVF) =
      i.search(1, query, 4, SearchOptions(kTopCentroids = 4, nProbe = 4))
        .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = results(idx)
    assert(before.nonEmpty)

    // simulate v4: collapse the context bucket level, stamp v4
    val conf = spark.sparkContext.hadoopConfiguration
    val ctxPath = s"$path/context"
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(ctxPath), conf)
    val stripped = spark.read.parquet(ctxPath).drop("doc_bucket")
    val tmp = new org.apache.hadoop.fs.Path(ctxPath + ".oldtmp")
    stripped.write.mode("overwrite").partitionBy("tenant", "field").parquet(tmp.toString)
    fs.delete(new org.apache.hadoop.fs.Path(ctxPath), true)
    fs.rename(tmp, new org.apache.hadoop.fs.Path(ctxPath))
    Json.write(s"$path/_meta/metadata.json",
      Map("format" -> "graft-ivf-parquet", "version" -> 4,
        "layout" -> "postings/tenant/field/centroid_bucket"))

    intercept[IllegalStateException](IndexIVF.open(spark, path))
    IndexIVF.migrate(spark, path)
    IndexIVF.migrate(spark, path) // idempotent
    val re = IndexIVF.open(spark, path)

    // the rewrite produced the real hive level under context/tenant/field
    // (doc 65 shares bucket 1 with doc 1 under DocBuckets=64)
    val dirs = new java.io.File(s"$path/context/tenant=1/field=0").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val want = Set(0L, 1L, 2L, 65L).map(id =>
      s"doc_bucket=${IndexIVF.docBucketOf(id)}")
    assert(dirs == want, s"expected context bucket dirs $want, got $dirs")

    // search results (incl. phase-2 exact scores read through the new
    // level) are bit-identical to the pre-migration index
    assert(results(re) == before, "migration changed search results")
  }
}
