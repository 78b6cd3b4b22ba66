package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-pipeline hot loops.
  *
  * The built-in formulations (`aggregate`/`zip_with`/`transform`
  * higher-order functions) are semantically identical but evaluate
  * INTERPRETED, one lambda invocation per array element per hash —
  * measured as the dominant cost of the MinHash/SimHash operators.
  * These expressions compute the same values (bit-for-bit, so the
  * DuckDB oracles are untouched) in tight JVM loops with zero
  * intermediate string allocation: md5 runs on raw UTF-8 bytes with
  * the salt prepended, and the 60-bit prefix is taken from the digest
  * bytes directly instead of via hex-string `substring`/`conv`.
  *
  * Registered as SQL functions through [[GraftExtensions]]
  * (`SparkSessionExtensions.injectFunction`) and called with
  * `functions.call_function` — no UDF/Encoder boundary.
  */
object Md5Hashing {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".getBytes

  def md5Salted(salt: Array[Byte], value: UTF8String): Array[Byte] = {
    val d = digests.get()
    d.reset()
    d.update(salt)
    d.update(value.getBytes)
    d.digest()
  }

  /** Value of the first 15 hex chars of the digest — identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)`. */
  def prefixLong(md5: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (md5(i) & 0xffL); i += 1 }
    (v << 4) | ((md5(7) & 0xf0L) >>> 4)
  }

  /** First 15 lowercase hex chars of the digest — identical to
    * `substring(md5(x), 1, 15)`. */
  def prefixHexBytes(md5: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](15)
    var k = 0
    while (k < 15) {
      val b = md5(k / 2) & 0xff
      out(k) = HexChars(if (k % 2 == 0) b >>> 4 else b & 0xf)
      k += 1
    }
    out
  }
}

/** `graft_simhash(tokens array<string>, bits)` — `bits`-wide SimHash:
  * per token, the 60-bit salted md5 prefix votes +/-1 on each bit;
  * bit j of the result is set iff its vote sum is positive. Matches
  * [[graft.text.TextFunctions.simHash]] exactly. */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  private val salt = "sim:".getBytes

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == ArrayType(StringType) ||
        child.dataType == ArrayType(StringType, containsNull = false))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"graft_simhash expects array<string>, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](bits)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Md5Hashing.prefixLong(
          Md5Hashing.md5Salted(salt, arr.getUTF8String(i)))
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_shingles(tokens array<string>, n)` — distinct space-joined
  * word n-grams, first-occurrence order: identical to
  * `array_distinct(TextFunctions.wordNgrams(tokens, n))` without the
  * interpreted per-index slice/concat lambdas. NULL input yields an
  * EMPTY array, exactly like the builtin spec: `wordNgrams` guards
  * with `size(toks) >= n`, and `size(NULL)` is -1 under the legacy
  * (non-ANSI) semantics this engine runs with, so the guard falls
  * through to the empty-array branch. */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[AnyRef]) else nullSafeEval(v)
  }
  override def checkInputDataTypes() =
    if (child.dataType == ArrayType(StringType) ||
        child.dataType == ArrayType(StringType, containsNull = false))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"graft_shingles expects array<string>, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements() - (n - 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        // concat_ws semantics: null elements are skipped along with
        // their separator (split output never contains nulls, but the
        // expression must match the built-in spec exactly).
        if (!arr.isNullAt(i + k)) {
          if (sb.length > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + k).toString)
        }
        k += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_minhash_sigs(shingles array<string>, perms)` — all `perms`
  * MinHash signature values in ONE pass over the shingle array:
  * element p is the minimum (lexicographic = numeric for fixed-width
  * hex) 15-char md5 prefix under salt `p<p>:`. Matches the exploded
  * `min(portableHashHex(...))` aggregation exactly, without the
  * explode + shuffle. Null when the array is empty. */
case class MinHashSigsExpr(child: Expression, perms: Int)
    extends UnaryExpression with CodegenFallback {
  private val salts = (0 until perms).map(p => s"p$p:".getBytes).toArray

  override def dataType: DataType = ArrayType(StringType)
  override def checkInputDataTypes() =
    if (child.dataType == ArrayType(StringType) ||
        child.dataType == ArrayType(StringType, containsNull = false))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"graft_minhash_sigs expects array<string>, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) return null
    val mins = new Array[Array[Byte]](perms)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var p = 0
        while (p < perms) {
          val hex = Md5Hashing.prefixHexBytes(Md5Hashing.md5Salted(salts(p), s))
          if (mins(p) == null || java.util.Arrays.compare(hex, mins(p)) < 0)
            mins(p) = hex
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromBytes(m)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
