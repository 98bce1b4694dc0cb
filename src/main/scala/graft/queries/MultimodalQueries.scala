package graft.queries

import graft.functions.VectorOps
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Driver-visible multimodal pipeline queries. The documents table's text is
  * cast to binary to stand in for media payloads; metadata extraction is
  * pure column work (oracle-checkable), featurization goes through the
  * stubbed codec (deterministic, rows-only check — see MultimodalSpec for
  * the determinism/batch-shape assertions).
  */
object MultimodalQueries {
  import QueryDef._

  val defs: Seq[QueryDef] = Seq(
    // MM1 — typed metadata over opaque binary payloads.
    sql("q_multimodal_meta", Seq("MM1"),
      """SELECT doc_id, octet_length(text::BLOB) AS size_bytes,
        |  octet_length(text::BLOB) * 4 AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        val media = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        Multimodal.withMeta(media, "payload")
          .select(col("doc_id"), col("meta.size_bytes").as("size_bytes"),
            col("meta.duration_ms").as("duration_ms"))
          .orderBy("doc_id")
    },

    // MM3 — resize + frame sampling over "video" payloads: per-doc frame
    // counts and total resized bytes (deterministic stub codec; rows-only).
    rowsOnly("q_multimodal_frames", Seq("MM3")) { (s, dir) =>
      val media = Tables.t(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val frames = Multimodal.sampleFrames(
        Multimodal.resized(media, "payload", w = 32, h = 32), "payload", everyMs = 500L)
      frames.groupBy(col("doc_id"))
        .agg(count(col("frame")).as("n_frames"), // null-frame rows count 0
          coalesce(sum(length(col("frame")).cast("long")), lit(0L)).as("frame_bytes"),
          max(length(col("resized")).cast("long")).as("resized_bytes"))
        .orderBy("doc_id")
    },

    // MM2 — stub-decode + feature extraction + cosine top-k over the
    // extracted features (the full media-similarity pipeline shape).
    rowsOnly("q_multimodal_features", Seq("MM2")) { (s, dir) =>
      val media = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val feats = Multimodal.withFeatures(media, "payload", dim = 16)
        .select(col("doc_id"), col("feature").cast("array<double>").as("emb"))
      val q = feats.filter(col("doc_id") === 0).select(col("emb").as("qe"))
      feats.filter(col("doc_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("doc_id"), round(VectorOps.dot(col("emb"), col("qe")), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    }
  )
}
