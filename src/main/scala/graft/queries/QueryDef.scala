package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable operator query: a Spark implementation plus (where
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names and ordering are kept identical on both sides so
  * the driver's sorted-column hash compare passes.
  */
final case class QueryDef(
    name: String,
    /** SURVEY.md §2 operator ids this query exercises, e.g. "P1", "J3". */
    covers: Seq[String],
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, covers: Seq[String], oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, covers, fn, Some(oracle))

  /** Deterministic cross-engine rounding: floor(x*10^d + 0.5)/10^d.
    * Spark's round() on doubles goes through BigDecimal.valueOf (shortest
    * decimal repr) while DuckDB rounds the raw double, so exact halves like
    * 4.725 split between engines; this form evaluates identically in both
    * given identical input doubles. Use for ratios of small integers; plain
    * round() is fine for "continuous" doubles (dot products etc.). */
  def floorRound(c: org.apache.spark.sql.Column, d: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{floor, lit}
    val p = math.pow(10, d)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  def rowsOnly(name: String, covers: Seq[String])(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, covers, fn, None)
}

/** JVM-local cache of persisted DataFrames keyed by (session, key): query
  * functions reuse expensive intermediate aggregations across invocations
  * within one session (bench + verify run every query in one JVM). Entries
  * are session-aware — a cached frame from a stopped session is rebuilt, not
  * served — and bounded by the number of distinct (session, key) pairs. */
object DfCache {
  private val cache = scala.collection.concurrent.TrieMap[
    (org.apache.spark.sql.SparkSession, String), DataFrame]()

  def getOrBuild(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    // drop entries pinned to stopped sessions so a long-lived JVM cycling
    // sessions doesn't accumulate dead object graphs
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    // serialized storage: these caches live for the whole bench/verify
    // session, and compact byte buffers put far less pressure on the old
    // generation than deserialized row objects (round-3 saw a collective
    // slowdown of the cheap queries that run AFTER the dedup caches fill)
    cache.getOrElseUpdate((s, key),
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
  }

  /** Unpersist and forget this session's entries — used by Bench between
    * repetitions so every repetition measures the COLD pipeline (the
    * session cache is a real feature, but a repeat that silently reuses the
    * previous repetition's persisted frames would report warm-cache minima
    * as if the code were faster). */
  def clear(s: SparkSession): Unit =
    cache.keys.filter(_._1 eq s).foreach { k =>
      cache.remove(k).foreach(_.unpersist(blocking = true))
    }
}

/** Shared table loaders. */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The testdata generator has shipped `ts` three ways across rounds:
    * TIMESTAMP(NANOS) (Spark 4 reads as long only via the legacy flag),
    * TIMESTAMP(MICROS) isAdjustedToUTC=false (Spark 4 reads as
    * TIMESTAMP_NTZ), and plain TIMESTAMP. Normalize all of them to an
    * ordinary TimestampType so downstream `unix_millis`/watermark code is
    * generation-independent. The NTZ→TIMESTAMP cast is exact under the UTC
    * session timezone this engine pins, and matches how the DuckDB oracle
    * reads the same file (naive timestamps). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val e = t(s, dir, "events")
    e.schema("ts").dataType match {
      case LongType         => e.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => e.withColumn("ts", col("ts").cast(TimestampType))
      case _                => e
    }
  }

  /** Same normalization for any externally-sourced timestamp column (the
    * engine's DATETIME intake, streaming fixtures): NTZ and nanos-long both
    * collapse to TimestampType; already-normal columns pass through. */
  def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType         => df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampNTZType => df.withColumn(colName, col(colName).cast(TimestampType))
      case _                => df
    }
  }

  /** embeddings with the float vector widened to double once, up front, so
    * every downstream kernel accumulates in f64 (matches the oracle). */
  def emb(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    e.select(e("vec_id"), e("embedding").cast("array<double>").as("emb"), e("label"))
  }
}
