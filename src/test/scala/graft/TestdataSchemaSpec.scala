package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary (VERDICT r9 item 3). The driver's testdata generator
  * has shipped `ts` three different ways across rounds — TIMESTAMP(NANOS),
  * then TIMESTAMP(MICROS) isAdjustedToUTC=false (TIMESTAMP_NTZ to Spark 4) —
  * and each silent regeneration broke a handful of downstream operators
  * before anything named the cause. This suite opens every sf0.01 table
  * through the SAME loaders the queries use and asserts the post-loader
  * schema, so the next regeneration fails HERE, by name, instead of as ten
  * scattered analysis exceptions.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("events loader normalizes ts to TimestampType for every generation") {
    val e = graft.queries.Tables.events(spark, dir)
    val f = fields(e)
    assert(f("ts") == TimestampType,
      s"events.ts must load as TimestampType (got ${f("ts")}); " +
        "Tables.events must normalize nanos-long AND TIMESTAMP_NTZ generations")
    assert(f("event_id") == LongType && f("user_id") == LongType)
    assert(f("event_type") == StringType && f("value") == DoubleType)
    // the exact expression family that broke in round 9 must analyze + run
    val n = e.select(unix_millis(col("ts")).as("ms")).filter(col("ms") > 0).limit(5).count()
    assert(n > 0)
  }

  test("embeddings load as array<float> raw and array<double> via Tables.emb") {
    val raw = graft.queries.Tables.t(spark, dir, "embeddings")
    assert(fields(raw)("embedding") == ArrayType(FloatType),
      s"raw embedding drifted: ${fields(raw)("embedding")}")
    assert(fields(raw)("vec_id") == LongType)
    val emb = graft.queries.Tables.emb(spark, dir)
    assert(fields(emb)("emb") == ArrayType(DoubleType))
  }

  test("documents table keeps the text-pipeline contract columns") {
    val f = fields(graft.queries.Tables.t(spark, dir, "documents"))
    assert(f("doc_id") == LongType && f("text") == StringType)
    assert(f("lang") == StringType && f("source") == StringType)
    assert(f("n_chars") == LongType)
  }

  test("TPC-H-ish tables keep the key/measure types the queries assume") {
    val li = fields(graft.queries.Tables.t(spark, dir, "lineitem"))
    assert(li("l_orderkey") == LongType && li("l_partkey") == LongType)
    assert(li("l_quantity") == DoubleType && li("l_extendedprice") == DoubleType)
    assert(li("l_returnflag") == StringType)
    // shipdate/orderdate are currently TIMESTAMP_NTZ and every consumer is
    // NTZ-safe (comparisons and max only — no unix_millis/watermarks); if
    // the generation changes again, this assertion names the drift
    assert(li("l_shipdate") == TimestampNTZType || li("l_shipdate") == TimestampType,
      s"l_shipdate drifted to ${li("l_shipdate")}")
    val ord = fields(graft.queries.Tables.t(spark, dir, "orders"))
    assert(ord("o_orderkey") == LongType && ord("o_totalprice") == DoubleType)
    assert(ord("o_orderdate") == TimestampNTZType || ord("o_orderdate") == TimestampType)
    val cust = fields(graft.queries.Tables.t(spark, dir, "customer"))
    assert(cust("c_custkey") == LongType && cust("c_acctbal") == DoubleType)
    assert(fields(graft.queries.Tables.t(spark, dir, "region"))("r_name") == StringType)
    assert(fields(graft.queries.Tables.t(spark, dir, "nation"))("n_name") == StringType)
    assert(fields(graft.queries.Tables.t(spark, dir, "supplier"))("s_suppkey") == LongType)
    assert(fields(graft.queries.Tables.t(spark, dir, "part"))("p_partkey") == LongType)
  }

  test("sf0.1 (the bench scale) opens through the loaders with the same contract") {
    // the bench reads sf0.1, which a PARTIAL regeneration could drift
    // independently of the sf0.01 tables the rest of this suite pins;
    // schema-only assertions through the same loaders keep this cheap
    val d1 = "/root/testdata/sf0.1"
    val e = fields(graft.queries.Tables.events(spark, d1))
    assert(e("ts") == TimestampType, s"sf0.1 events.ts drifted: ${e("ts")}")
    assert(e("event_id") == LongType && e("user_id") == LongType)
    val emb = fields(graft.queries.Tables.t(spark, d1, "embeddings"))
    assert(emb("embedding") == ArrayType(FloatType) && emb("vec_id") == LongType)
    val doc = fields(graft.queries.Tables.t(spark, d1, "documents"))
    assert(doc("doc_id") == LongType && doc("text") == StringType &&
      doc("lang") == StringType && doc("source") == StringType &&
      doc("n_chars") == LongType)
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        val f = fields(graft.queries.Tables.t(spark, d1, t))
        assert(f.nonEmpty, s"sf0.1 $t failed to open through the loader")
      }
    val li = fields(graft.queries.Tables.t(spark, d1, "lineitem"))
    assert(li("l_quantity") == DoubleType &&
      (li("l_shipdate") == TimestampNTZType || li("l_shipdate") == TimestampType),
      s"sf0.1 lineitem drifted: quantity=${li("l_quantity")} shipdate=${li("l_shipdate")}")
  }

  test("normalizeTs collapses NTZ and nanos-long inputs; passes normal through") {
    import spark.implicits._
    val normal = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
      .toDF("id", "ts")
    assert(fields(graft.queries.Tables.normalizeTs(normal, "ts"))("ts") == TimestampType)
    val asNtz = normal.select(col("id"), col("ts").cast(TimestampNTZType).as("ts"))
    val fromNtz = graft.queries.Tables.normalizeTs(asNtz, "ts")
    assert(fields(fromNtz)("ts") == TimestampType)
    // value-exact under the UTC session timezone
    assert(fromNtz.select(unix_millis(col("ts"))).as[Long].head() ==
      normal.select(unix_millis(col("ts"))).as[Long].head())
    val asNanosLong = normal.select(col("id"),
      (unix_millis(col("ts")) * lit(1000000L)).as("ts"))
    val fromLong = graft.queries.Tables.normalizeTs(asNanosLong, "ts")
    assert(fields(fromLong)("ts") == TimestampType)
    assert(fromLong.select(unix_millis(col("ts"))).as[Long].head() ==
      normal.select(unix_millis(col("ts"))).as[Long].head())
  }
}
