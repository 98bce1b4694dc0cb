package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Shared text-hashing kernels for the dedup pipelines (batch q_dedup_simhash
  * and the streaming near-dup dedup twin). */
object TextHash {

  /** 64-bit SimHash over a token array: per-bit majority vote across
    * splitmix64 token hashes — one pass per doc, a scalar function (no
    * explode + 64 shuffled aggregations). Stable across runs/JVMs (pure
    * integer arithmetic over utf8 bytes). */
  val simhash64: UserDefinedFunction = udf { (tokens: Seq[String]) =>
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      // splitmix64 over the token's utf8 bytes — stable across runs
      var h = 0L
      t.getBytes("UTF-8").foreach { byte =>
        var z = (h ^ byte) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        h = z ^ (z >>> 31)
      }
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) >= 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** Per-doc DISTINCT xxhash64'd 3-word shingles in one pass over the raw
    * utf8 bytes — see [[graft.functions.HashedShingles3]], the native
    * Catalyst expression this delegates to (zero string materialization:
    * each shingle is a byte SUBRANGE of the input's own backing memory).
    * Null for docs shorter than 3 tokens (callers filter). Values are
    * bit-identical to Spark's `xxhash64(concat_ws(' ', ...))` — the kernel
    * calls the same catalyst XXH64 over the same utf8 bytes with the same
    * seed (42) — so swapping this in changes no downstream result. The
    * equivalent higher-order-function chain (transform + sequence +
    * concat_ws + array_distinct) is NOT whole-stage codegen'd (HOF lambdas
    * evaluate interpreted per element) and was measured ~2x slower than
    * even the UDF predecessor of this expression. */
  def hashedShingles3(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    HashedShingles3(c)

  /** The `n` MinHash permutation mins over a shingle-hash array in one
    * pass — delegates to [[graft.functions.MinHashSigs]], the native
    * Catalyst expression (reads longs straight out of ArrayData; the UDF
    * predecessor boxed every shingle hash into a Seq[Long] per row). See
    * its scaladoc for the bit-parity construction. */
  def minhashSigs(n: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => MinHashSigs(c, n)
}
