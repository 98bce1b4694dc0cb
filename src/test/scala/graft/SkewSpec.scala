package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew utilities: salted plans must return exactly the plain plan's results
  * while spreading each hot key across the salt space. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 1 hot key (10k rows) + 100 cold keys
  def skewed = {
    import spark.implicits._
    ((0 until 10000).map(i => ("hot", i.toLong)) ++
      (0 until 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
  }

  test("saltedAgg equals the plain aggregation") {
    val plain = skewed.groupBy("k").agg(sum("v").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedAgg(skewed, Seq("k"), salt = 16, Seq("v"),
        partial = c => sum(c), fin = c => sum(c))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedAgg spreads a hot key with heterogeneous rows over many buckets") {
    // the case salting exists for: one hot key, rows differing in value
    // (bit-identical rows need no salt — map-side partial agg collapses
    // them before the shuffle; see Skew scaladoc)
    val buckets = skewed.filter(col("k") === "hot")
      .withColumn("_salt", Skew.saltCol(16, col("k"), col("v")))
      .select("_salt").distinct().count()
    assert(buckets > 8, s"hot key used only $buckets of 16 salt buckets")
  }

  test("salt is deterministic per row (retry-stable)") {
    val once = skewed.withColumn("_salt", Skew.saltCol(16, col("k"), col("v")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val twice = skewed.withColumn("_salt", Skew.saltCol(16, col("k"), col("v")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(once == twice)
  }

  test("saltedJoin equals the plain join") {
    import spark.implicits._
    val dim = (Seq("hot") ++ (0 until 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "attr")
    val plain = skewed.join(dim, "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", salt = 8)
      .select("k", "v", "attr")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
