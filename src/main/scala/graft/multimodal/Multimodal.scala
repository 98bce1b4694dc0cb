package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for large-scale training-data pipelines:
  * image/audio/video payloads are opaque `binary` columns with a typed
  * metadata struct, and decode / feature-extract / resize / frame-sample run
  * as partition-mapped batch operators.
  *
  * The actual media codecs are STUBBED (no image/audio libraries in this
  * environment): [[StubCodec]] produces deterministic fake pixels/features
  * derived from the payload hash, clearly marked. Everything Spark-side —
  * schema, partition batching, per-partition codec reuse, column pruning —
  * is real and tested, so swapping StubCodec for javacv/ffmpeg is a local
  * change.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("size_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** ===== STUB ===== deterministic fake decoder standing in for a real
    * media library. Real implementation: decode bytes -> pixels/samples.
    * The fake derives every output from xxhash-style mixing of the payload
    * so results are stable across runs and partitionings. */
  object StubCodec extends Serializable {
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def contentHash(bytes: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = mix(h ^ bytes(i)); i += 1 }
      h
    }
    /** STUB dimensions "parsed from the header". */
    def dims(bytes: Array[Byte]): (Int, Int) = {
      val h = contentHash(bytes)
      (64 + (h & 0x3F).toInt * 8, 64 + ((h >> 6) & 0x3F).toInt * 8)
    }
    /** STUB mime sniffing from the first byte. */
    def sniffMime(bytes: Array[Byte]): String =
      if (bytes.isEmpty) "application/octet-stream"
      else (bytes(0) & 0x3) match {
        case 0 => "image/jpeg"
        case 1 => "image/png"
        case 2 => "audio/wav"
        case _ => "video/mp4"
      }
    /** STUB feature extractor: `dim` floats in [-1,1) derived from md5 of
      * the payload (real impl: a vision/audio model forward pass over
      * decoded media). md5-based — unlike the wrapping mix() chain — so the
      * whole featurize -> similarity pipeline has a bit-exact DuckDB twin
      * (q_multimodal_features' generated oracle): both engines compute
      * ('0x' || substr(md5(payload || ':' || i), 1, 15))::BIGINT, scale by
      * the exact power of two 2^60, and land on float32 with the same
      * IEEE round-to-nearest conversions. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dim) { i =>
        md.reset()
        md.update(bytes)
        md.update(s":$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val digest = md.digest()
        // first 15 hex chars = top 60 bits (7.5 bytes) of the digest
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (digest(b) & 0xFFL); b += 1 }
        v = (v << 4) | ((digest(7) & 0xF0L) >> 4)
        ((v.toDouble / (1L << 60).toDouble) * 2 - 1).toFloat
      }
    }
    /** STUB resize: re-hash with the target size mixed in. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.min(bytes.length, 32).max(8))
      val seed = mix(contentHash(bytes) ^ (w.toLong << 32) ^ h.toLong)
      var i = 0
      while (i < out.length) { out(i) = (mix(seed + i) & 0xFF).toByte; i += 1 }
      out
    }
  }

  /** Attach the typed metadata struct from the payload (header sniffing —
    * cheap, no full decode; runs codegen-side except the two stub UDFs). */
  def withMeta(df: DataFrame, binCol: String): DataFrame = {
    val sniff = udf((b: Array[Byte]) => StubCodec.sniffMime(b))
    val dims = udf((b: Array[Byte]) => StubCodec.dims(b))
    df.withColumn("_dims", dims(col(binCol)))
      .withColumn("meta", struct(
        sniff(col(binCol)).as("mime"),
        length(col(binCol)).cast("long").as("size_bytes"),
        col("_dims._1").as("width"),
        col("_dims._2").as("height"),
        (length(col(binCol)).cast("long") * 4).as("duration_ms")))
      .drop("_dims")
  }

  /** Feature extraction as a partition-mapped batch operator: the codec is
    * instantiated once per partition (the real-world pattern for model
    * handles / native contexts), then applied row-by-row within the batch. */
  def withFeatures(df: DataFrame, binCol: String, dim: Int = 64,
      out: String = "feature"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(out, ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val codec = StubCodec // per-partition handle (stub is a singleton)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ codec.features(bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Batch resize of the payload column. */
  def resized(df: DataFrame, binCol: String, w: Int, h: Int,
      out: String = "resized"): DataFrame = {
    val resize = udf((b: Array[Byte]) => StubCodec.resize(b, w, h))
    df.withColumn(out, resize(col(binCol)))
  }

  /** Frame sampling for "video" payloads: one synthetic frame payload per
    * sampled offset, exploded to rows (real impl: keyframe extraction).
    * explode_outer keeps zero-duration payloads as a single null-frame row
    * so per-doc aggregations don't silently drop them. */
  def sampleFrames(df: DataFrame, binCol: String, everyMs: Long): DataFrame = {
    val frames = udf { (b: Array[Byte]) =>
      val durationMs = b.length.toLong * 4
      (0L until durationMs by everyMs).map(off =>
        StubCodec.resize(b, (off & 0xFF).toInt + 1, 1)).toArray
    }
    df.withColumn("frame", explode_outer(frames(col(binCol))))
  }
}
