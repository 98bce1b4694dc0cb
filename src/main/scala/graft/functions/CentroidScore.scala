package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native phase-1 PLAID scoring expression: the approximate MaxSim over a
  * document's centroid codes (reference colbert_centroid_score,
  * lintdb/scoring/plaid.cpp:65-95) as a codegen'd Catalyst expression.
  *
  * The per-query (numQueryTokens x numCentroids) score matrix is a plan
  * constant attached via `addReferenceObj` — it ships once per stage with
  * the task binary (same distribution cost as an explicit broadcast) and is
  * read zero-copy per row. Replaces a Scala UDF on the hottest search path:
  * no CatalystTypeConverters, no Seq[Long] materialization per candidate —
  * the kernel reads the unsafe array data directly.
  */
case class CentroidScore(
    child: Expression,
    matrix: Array[Float],
    numQueryTokens: Int,
    numCentroids: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_centroid_score expects array<bigint>, got ${other.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(codes: Any): Any =
    CentroidScore.compute(codes.asInstanceOf[ArrayData], matrix,
      numQueryTokens, numCentroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroidScoreMatrix", matrix, "float[]")
    nullSafeCodeGen(ctx, ev, codes =>
      s"${ev.value} = graft.functions.CentroidScore.compute(" +
        s"$codes, $matRef, $numQueryTokens, $numCentroids);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidScore =
    copy(child = newChild)

  override def prettyName: String = "graft_centroid_score"
}

object CentroidScore {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(codes: Column, matrix: Array[Float], nq: Int, nc: Int): Column =
    Bridge.column(CentroidScore(Bridge.expression(codes), matrix, nq, nc))

  /** The kernel over raw ArrayData — semantics identical to
    * Plaid.colbertCentroidScore (unique codes, per-query-token max, sum);
    * static + JIT-friendly so generated code stays a one-liner. */
  def compute(codes: ArrayData, m: Array[Float], nq: Int, nc: Int): Double = {
    val perToken = new Array[Float](nq)
    java.util.Arrays.fill(perToken, -9999.0f)
    val n = codes.numElements()
    val seen = new java.util.HashSet[Long]()
    var j = 0
    while (j < n) {
      val code = codes.getLong(j)
      if (seen.add(code)) {
        val base = code.toInt
        var k = 0
        while (k < nq) {
          val s = m(k * nc + base)
          if (s > perToken(k)) perToken(k) = s
          k += 1
        }
      }
      j += 1
    }
    // float accumulation, then widen — bit-identical to
    // Plaid.colbertCentroidScore(...).toDouble (the UDF it replaces)
    var score = 0.0f
    var k = 0
    while (k < nq) { score += perToken(k); k += 1 }
    score.toDouble
  }
}
