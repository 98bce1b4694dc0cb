package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-doc DISTINCT xxhash64'd 3-word shingles as a native Catalyst
  * expression over the raw UTF8String — ZERO string materialization.
  *
  * The key observation: `split(text, ' ')` separators are single spaces by
  * definition (a run of k spaces yields k-1 empty tokens), so the bytes of
  * any 3-token shingle `tᵢ ⧺ " " ⧺ tᵢ₊₁ ⧺ " " ⧺ tᵢ₊₂` are EXACTLY the byte
  * subrange of the original text from the start of token i to the end of
  * token i+2. The kernel therefore scans the utf8 bytes once for space
  * positions (0x20 never occurs inside a multi-byte utf8 sequence, so the
  * byte scan is unicode-safe) and hashes subranges of the text's own
  * backing memory — no String decode to UTF-16, no per-shingle buffer, no
  * UDF boxing. Hashes are bit-identical to
  * `xxhash64(concat_ws(' ', slice(split(text, ' '), i+1, 3)))` (the
  * adversarial-unicode parity spec pins this), so swapping the kernel
  * changes no downstream result.
  *
  * Returns null for docs with fewer than 3 tokens (callers filter), like
  * the builtin formulation's CASE guard.
  */
case class HashedShingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_shingles3 expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashedShingles3.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = graft.functions.HashedShingles3.kernel($s);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HashedShingles3 =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles3"
}

/** The `n` MinHash permutation mins over a shingle-hash array as a native
  * expression: reads longs straight out of ArrayData (the UDF predecessor
  * deserialized the array into a boxed Seq[Long] per row — one box per
  * shingle hash on a multi-million-shingle pass). Bit-identical to
  * `array_min(transform(shs, x -> xxhash64(lit(i), x)))` for i in 0..n-1:
  * Spark's XxHash64 chains child hashes through the seed
  * (h = hashInt(i, 42); h = hashLong(x, h)), replicated here with
  * precomputed per-permutation seeds. Widening n only appends
  * permutations: h0..h15 of a 32-wide signature are bit-identical to the
  * 16-wide one. */
case class MinHashSigs(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash_sigs expects array<bigint>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.kernel(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.MinHashSigs.kernel($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sigs"
}

object MinHashSigs {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(c: Column, n: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(c), n))

  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def seeds(n: Int): Array[Long] =
    seedCache.computeIfAbsent(n, m =>
      Array.tabulate(m)(i =>
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L)))

  def kernel(shs: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val sd = seeds(n)
    val mins = Array.fill(n)(Long.MaxValue)
    val m = shs.numElements()
    var idx = 0
    while (idx < m) {
      val sh = shs.getLong(idx)
      var i = 0
      while (i < n) {
        val h = XXH64.hashLong(sh, sd(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      idx += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** 64-bit SimHash over whitespace tokens of the raw UTF8String — per-bit
  * majority vote across splitmix64 token hashes, computed straight over
  * byte subranges of the input (tokens are the ranges between 0x20 bytes,
  * including empties from consecutive spaces — matching `split(text, ' ')`
  * exactly). Replaces simhash64(split(text, ' ')): no String array
  * materialization, no UTF-16 decode, no UDF boxing; bit-identical to the
  * UDF-over-tokens formulation (parity spec pins it — note the hash step
  * XORs the SIGNED byte, sign-extended, exactly like the UDF's
  * `h ^ byte`). */
case class SimHash64Text(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash64 expects string, got ${other.simpleString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash64Text.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SimHash64Text.kernel($s);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Text =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

object SimHash64Text {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(c: Column): Column = Bridge.column(SimHash64Text(Bridge.expression(c)))

  def kernel(s: UTF8String): Long = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val counts = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      val atSep = i == n ||
        org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20
      if (atSep) {
        // token = bytes [start, i) — splitmix64 over the signed bytes,
        // identical to the UDF's per-String loop (empty token -> h = 0)
        var h = 0L
        var j = start
        while (j < i) {
          var z = (h ^ org.apache.spark.unsafe.Platform.getByte(base, off + j)) +
            0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          h = z ^ (z >>> 31)
          j += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) >= 0) sig |= 1L << b; b += 1 }
    sig
  }
}

object HashedShingles3 {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(c: Column): Column = Bridge.column(HashedShingles3(Bridge.expression(c)))

  /** The zero-copy kernel; static + JIT-friendly so generated code stays a
    * one-liner. Returns null for < 3 tokens. */
  def kernel(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // pass 1: count spaces (tokens = spaces + 1)
    var spaces = 0
    var i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    if (spaces < 2) return null // fewer than 3 tokens
    // pass 2: space positions (token j ends at pos(j) for j < tokens-1)
    val pos = new Array[Int](spaces)
    var k = 0
    i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        pos(k) = i; k += 1
      }
      i += 1
    }
    val tokens = spaces + 1
    // per-doc DISTINCT, first-seen order — identical to array_distinct over
    // the transform(sequence(...)) formulation
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i + 2 < tokens) {
      val start = if (i == 0) 0 else pos(i - 1) + 1
      val end = if (i + 2 == tokens - 1) n else pos(i + 2)
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        base, off + start, end - start, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
