package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<double>` columns.
  *
  * Implements the reference's scalar vector kernels (inner product:
  * lintdb/quantizers/CoarseQuantizer.cpp:108-110; L2 normalize:
  * lintdb/util.cpp:23-44) as Catalyst higher-order-function expressions so
  * they run distributed inside the SQL engine — no UDF serialization, no
  * driver-side loops.
  *
  * All helpers expect `array<double>`; cast `array<float>` storage columns
  * once at load time (`col.cast("array<double>")`) so accumulation happens
  * in double precision — this matches the DuckDB oracle
  * (`list_inner_product(x::DOUBLE[], y::DOUBLE[])`) bit-for-bit because both
  * engines accumulate sequentially left-to-right.
  */
object VectorOps {

  /** Inner product <a,b>. Sequential left-to-right accumulation, via the
    * codegen'd [[DotProduct]] expression (stays in whole-stage codegen). */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Interpreted HOF formulation — kept for plan-comparison tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm ||a||. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity <a,b> / (||a||*||b||). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** L2-normalized copy of the vector (reference: lintdb/util.cpp:23-44).
    * Norm-zero vectors pass through unchanged, matching cblas sscal skip. */
  def l2normalize(a: Column): Column = {
    val n = l2norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => x / n))
  }

  /** Squared euclidean distance ||a-b||^2. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
}
