package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the "salt hot tenants" knob of
  * DESIGN.md). AQE's skew-join handles sort-merge joins automatically; these
  * cover the cases it cannot: aggregations over skewed grouping keys and
  * joins where one hot key would otherwise pin a single reducer.
  *
  * Both are deterministic (content-hash salt, no rand()) so results are
  * stable across retries and partition layouts.
  */
object Skew {

  /** Deterministic salt in [0, salt) from the hash of the given columns. */
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
    val saltCols = valueCols.map(col) // salt on the values: uniform spread
    val salted = df.withColumn("_salt", saltCol(salt, saltCols: _*))
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
    val nonKey = left.columns.filterNot(_ == key).map(col).toSeq
    val l = left.withColumn("_salt",
      saltCol(salt, (col(key) +: nonKey): _*))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
