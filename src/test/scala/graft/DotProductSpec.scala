package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd DotProduct must be value-identical to the interpreted
  * higher-order-function formulation (same left-to-right accumulation). */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native expression matches HOF formulation bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.dotHof(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "must be bit-identical")
    }
  }

  test("nulls propagate, mismatched lengths use shorter prefix") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0))).toDF("a", "b")
    assert(df.select(VectorOps.dot(col("a"), col("b"))).head().getDouble(0) == 11.0)
    val withNull = df.select(VectorOps.dot(lit(null).cast("array<double>"), col("b")))
    assert(withNull.head().isNullAt(0))
  }

  test("stays inside WholeStageCodegen over a parquet scan") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("emb"))
    val df = e.select(VectorOps.dot(col("emb"), col("emb")).as("d"))
      .filter(col("d") > 0)
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), plan)
    assert(df.count() > 0)
  }
}
