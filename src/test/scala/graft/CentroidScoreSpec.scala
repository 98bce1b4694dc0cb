package graft

import graft.functions.CentroidScore
import graft.scoring.Plaid
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native phase-1 expression must be bit-identical to the Plaid kernel
  * it replaced, and must run inside whole-stage codegen. */
class CentroidScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val rnd = new scala.util.Random(11L)
  val nq = 4
  val nc = 8
  val matrix = Array.fill(nq * nc)(rnd.nextFloat() * 2 - 1)

  test("expression matches Plaid.colbertCentroidScore on random code lists") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(nc).toLong))
    }
    val df = rows.toDF("id", "codes")
      .select(col("id"), CentroidScore(col("codes"), matrix, nq, nc).as("s"))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, codes) =>
      val expected = Plaid.colbertCentroidScore(codes.toArray, matrix, nq, nc).toDouble
      assert(got(id) == expected, s"row $id")
    }
  }

  test("expression stays inside WholeStageCodegen") {
    // a range source (a local Seq constant-folds to LocalTableScan)
    val df = spark.range(100)
      .select(CentroidScore(
        sequence(lit(0L), col("id") % (nc - 1)), matrix, nq, nc).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` operator prefix marks WholeStageCodegen participation
    assert(plan.contains("*(1) Project [graft_centroid_score"), plan)
    assert(df.agg(sum(col("s"))).collect().head.getDouble(0) != 0.0)
  }

  test("null codes yield null score (null-intolerant)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Seq[Long]]), (2L, Some(Seq(0L))))
      .toDF("id", "codes")
      .select(col("id"), CentroidScore(col("codes"), matrix, nq, nc).as("s"))
    val rows = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows(1L) && !rows(2L))
  }
}
