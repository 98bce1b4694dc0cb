package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the "salt hot tenants" knob of
  * DESIGN.md). AQE's skew-join handles sort-merge joins automatically; these
  * cover the cases it cannot: aggregations over skewed grouping keys and
  * joins where one hot key would otherwise pin a single reducer.
  *
  * The salt is a deterministic hash of the FULL row, which makes it stable
  * under stage retries and speculative execution (a nondeterministic salt —
  * rand() or a monotonic id — can double-count or drop rows when a map task
  * is recomputed after a fetch failure: the SPARK-23207 failure class).
  * The tradeoff: rows that are bit-identical land in the same salt bucket.
  * That is the right tradeoff — for algebraic aggregates, map-side partial
  * aggregation already collapses identical rows before the shuffle (no skew
  * problem exists), so salting is only ever needed for hot keys with
  * heterogeneous rows, which a full-row hash spreads uniformly.
  */
object Skew {

  /** Deterministic, retry-stable salt in [0, salt) from a full-row hash. */
  def saltCol(salt: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salt.toLong)).cast("int")

  /** Two-phase aggregation over a skewed grouping key: partial-aggregate on
    * (key, salt) — spreading each hot key over `salt` reducers — then
    * final-aggregate on key. Caller supplies the same-shaped partial and
    * final aggs (sum/sum, count/sum, min/min, ...).
    *
    * Example: saltedAgg(df, Seq("k"), 16, Seq("v"),
    *   partial = c => sum(c), fin = c => sum(c))
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
      valueCols: Seq[String],
      partial: Column => Column, fin: Column => Column): DataFrame = {
    val salted = df.withColumn("_salt", saltCol(salt, df.columns.map(col).toSeq: _*))
    val partialAgg = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial(col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(c => partial(col(c)).as(c)): _*)
    partialAgg
      .groupBy(keys.map(col): _*)
      .agg(fin(col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(c => fin(col(c)).as(c)): _*)
  }

  /** Salted inner equi-join: left rows scatter across `salt` sub-keys via
    * the retry-stable full-row hash; the right side is replicated `salt`
    * times. Use when one hot join key would pin a reducer and the right side
    * is too big to broadcast outright but small enough to replicate
    * `salt`-fold. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    val l = left.withColumn("_salt", saltCol(salt, left.columns.map(col).toSeq: _*))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
