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

  /** Generated DuckDB twin of q_multimodal_features: recompute each of the
    * 16 md5-derived stub features from the raw text (the Spark side's
    * binary payload IS the text's UTF-8 bytes), then the same dot-product
    * top-k. Arithmetic parity: ('0x'||substr(md5(..),1,15))::BIGINT is the
    * digest's top 60 bits on both sides; int64->f64 conversion, division by
    * the exact power 2^60, *2, -1 are all identically-rounded IEEE ops; the
    * ::FLOAT landing matches Scala's .toFloat; the dot is an explicit
    * left-associated f64 term chain like the Spark kernel. */
  private[queries] lazy val featuresOracleSql: String = {
    val dim = 16
    def feat(i: Int): String =
      s"((('0x' || substr(md5(text || ':$i'), 1, 15))::BIGINT::DOUBLE " +
        "/ 1152921504606846976.0 * 2 - 1)::FLOAT)"
    val featCols = (0 until dim).map(i => s"${feat(i)} AS f$i").mkString(", ")
    val dotChain = (0 until dim).map(i => s"e.f$i::DOUBLE * q.f$i::DOUBLE").mkString(" + ")
    s"""WITH f AS (SELECT doc_id, $featCols FROM documents),
       |q AS (SELECT * FROM f WHERE doc_id = 0)
       |SELECT e.doc_id, round($dotChain, 4) AS score
       |FROM f e, q WHERE e.doc_id <> 0
       |ORDER BY score DESC, e.doc_id LIMIT 10""".stripMargin
  }

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
    // counts and total resized bytes, HASH-CHECKED: the stub codec's OUTPUT
    // SIZES are pure functions of the payload length (frame count =
    // ceil(duration/500ms) with duration = 4*len; every resized payload is
    // clamp(len, 8, 32) bytes), so the oracle recomputes the aggregates
    // from octet_length alone — pinning the explode_outer fan-out, the
    // zero-duration null-frame row, and the per-frame sizing.
    sql("q_multimodal_frames", Seq("MM3"),
      """SELECT doc_id,
        |  CASE WHEN octet_length(text::BLOB) = 0 THEN 0
        |       ELSE (octet_length(text::BLOB) * 4 - 1) // 500 + 1 END AS n_frames,
        |  (CASE WHEN octet_length(text::BLOB) = 0 THEN 0
        |        ELSE (octet_length(text::BLOB) * 4 - 1) // 500 + 1 END)
        |    * greatest(least(octet_length(text::BLOB), 32), 8) AS frame_bytes,
        |  greatest(least(octet_length(text::BLOB), 32), 8) AS resized_bytes
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
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

    // MM2 — stub-decode + feature extraction + similarity top-k over the
    // extracted features (the full media-similarity pipeline shape),
    // HASH-CHECKED: the stub featurizer is md5-derived, so the generated
    // oracle recomputes every feature AND the dot product bit-exactly in
    // DuckDB (see [[featuresOracleSql]]) — the mapPartitions batch path,
    // the f32 feature landing, and the f64 accumulation all verified.
    sql("q_multimodal_features", Seq("MM2"), featuresOracleSql) { (s, dir) =>
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
