package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def mediaDf = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
  }

  test("metadata struct: mime/size/dims attached without full decode") {
    val withMeta = Multimodal.withMeta(mediaDf, "payload")
    val r = withMeta.select("meta.mime", "meta.size_bytes", "meta.width").collect()
    assert(r.length == 500)
    assert(r.forall(_.getLong(1) > 0))
    assert(r.forall(x => x.getString(0).contains("/")))
  }

  test("feature extraction via mapPartitions is deterministic and batch-shaped") {
    val a = Multimodal.withFeatures(mediaDf, "payload", dim = 8)
      .select("doc_id", "feature").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // repartition differently: results must not change
    val b = Multimodal.withFeatures(mediaDf.repartition(7), "payload", dim = 8)
      .select("doc_id", "feature").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 8))
  }

  test("resize and frame sampling produce per-row / exploded outputs") {
    val rs = Multimodal.resized(mediaDf, "payload", 32, 32)
    assert(rs.select("resized").head().getAs[Array[Byte]](0).nonEmpty)
    val frames = Multimodal.sampleFrames(mediaDf.limit(5), "payload", everyMs = 200)
    assert(frames.count() > 5, "each doc yields multiple frames")
  }

  test("feature column feeds the similarity operators end-to-end") {
    import graft.functions.VectorOps
    val feats = Multimodal.withFeatures(mediaDf, "payload", dim = 8)
      .select(col("doc_id"), col("feature").cast("array<double>").as("emb"))
    val q = feats.filter(col("doc_id") === 0).select(col("emb").as("qe"))
    val top = feats.crossJoin(broadcast(q))
      .select(col("doc_id"), VectorOps.cosine(col("emb"), col("qe")).as("s"))
      .orderBy(col("s").desc).limit(3).collect()
    assert(top.head.getLong(0) == 0L, "cosine self-match is maximal")
  }
}
