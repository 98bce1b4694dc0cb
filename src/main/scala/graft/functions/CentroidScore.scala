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

/** Batch-search twin of [[CentroidScore]]: scores (query_id, doc_codes)
  * pairs against a per-query matrix map attached as a plan constant — one
  * expression serves the whole query batch with no UDF boxing. */
case class BatchCentroidScore(
    left: Expression,
    right: Expression,
    matrices: java.util.HashMap[java.lang.Long, (Array[Float], Int)],
    numCentroids: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_batch_centroid_score expects (bigint, array<bigint>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(qid: Any, codes: Any): Any =
    BatchCentroidScore.compute(qid.asInstanceOf[Long],
      codes.asInstanceOf[ArrayData], matrices, numCentroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("batchCentroidMatrices", matrices,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (qid, codes) =>
      s"${ev.value} = graft.functions.BatchCentroidScore.compute(" +
        s"$qid, $codes, $matRef, $numCentroids);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BatchCentroidScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_batch_centroid_score"
}

object BatchCentroidScore {
  import org.apache.spark.sql.graftbridge.Bridge

  /** @param matrices qid -> (row-major nq x nc float matrix, nq) */
  def apply(qid: Column, codes: Column,
      matrices: Map[Long, (Array[Float], Int)], nc: Int): Column = {
    val jm = new java.util.HashMap[java.lang.Long, (Array[Float], Int)]()
    matrices.foreach { case (k, v) => jm.put(k, v) }
    Bridge.column(BatchCentroidScore(
      Bridge.expression(qid), Bridge.expression(codes), jm, nc))
  }

  def compute(qid: Long, codes: ArrayData,
      mats: java.util.HashMap[java.lang.Long, (Array[Float], Int)], nc: Int): Double = {
    val e = mats.get(qid)
    require(e != null, s"no score matrix for query_id $qid")
    CentroidScore.compute(codes, e._1, e._2, nc)
  }
}

object CentroidScore {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(codes: Column, matrix: Array[Float], nq: Int, nc: Int): Column =
    Bridge.column(CentroidScore(Bridge.expression(codes), matrix, nq, nc))

  /** The kernel over raw ArrayData — results identical to
    * Plaid.colbertCentroidScore; static + JIT-friendly so generated code
    * stays a one-liner. The reference's unique-code set (plaid.cpp:75-87)
    * is dropped here: per-token MAX is idempotent, so deduping repeated
    * codes cannot change the result — it only trades a few redundant float
    * compares for a per-row HashSet allocation and one boxed Long per code,
    * which is the wrong trade on the per-candidate hot loop. */
  def compute(codes: ArrayData, m: Array[Float], nq: Int, nc: Int): Double = {
    val perToken = new Array[Float](nq)
    java.util.Arrays.fill(perToken, -9999.0f)
    val n = codes.numElements()
    var j = 0
    while (j < n) {
      val base = codes.getLong(j).toInt
      var k = 0
      while (k < nq) {
        val s = m(k * nc + base)
        if (s > perToken(k)) perToken(k) = s
        k += 1
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
