package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the "salt hot tenants" knob of
  * DESIGN.md). AQE's skew-join handles sort-merge joins automatically; these
  * cover the cases it cannot: aggregations over skewed grouping keys and
  * joins where one hot key would otherwise pin a single reducer.
  *
  * The salt is derived from a row-unique id (hashed for uniformity), so a
  * hot key spreads evenly even when every one of its rows carries identical
  * values — a content hash would collapse duplicates onto one bucket. The
  * assignment depends on partition layout, but both helpers are agnostic to
  * WHICH bucket a row lands in: results are identical for any assignment.
  */
object Skew {

  /** Uniform salt in [0, salt) from a row-unique id. */
  def saltCol(salt: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)).cast("int")

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
    val salted = df.withColumn("_salt", saltCol(salt))
    val partialAgg = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial(col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(c => partial(col(c)).as(c)): _*)
    partialAgg
      .groupBy(keys.map(col): _*)
      .agg(fin(col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(c => fin(col(c)).as(c)): _*)
  }

  /** Salted inner equi-join: left rows scatter across `salt` sub-keys via a
    * content hash; the right side is replicated `salt` times. Use when one
    * hot join key would pin a reducer and the right side is too big to
    * broadcast outright but small enough to replicate `salt`-fold. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    val l = left.withColumn("_salt", saltCol(salt))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
