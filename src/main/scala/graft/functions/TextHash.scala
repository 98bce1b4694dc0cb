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
}
