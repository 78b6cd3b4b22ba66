package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native expression — the graded
  * companion to the thresholded Levenshtein in
  * [[graft.etl.Linkage]]: edit distance answers "how many edits",
  * Jaro-Winkler answers "how alike do these short strings look",
  * weighting shared prefixes the way human-entered names drift
  * (transposed letters, dropped suffixes). Scoring is per-pair
  * scalar work in the join's hot loop, so it is an `Expression` with
  * real codegen (a static call inside whole-stage codegen, the same
  * shape as Spark's own `levenshtein`), never a UDF.
  *
  * Definition (the standard one): Jaro similarity from match count m
  * (equal chars within the floor(max(l1,l2)/2)-1 window),
  * half-transposition count t; Winkler boost
  * `jw = j + min(prefix,4) * 0.1 * (1-j)` applied only when j > 0.7.
  * Any empty side scores 0 — including BOTH empty, matching DuckDB's
  * convention (verified empirically).
  *
  * DuckDB parity, precisely: bit-identical on ASCII input (fixture-
  * and corpus-verified — the `jw_match` oracle hash-matches on the
  * full blocked pair space). On NON-ASCII input the two diverge BY
  * DESIGN: this expression matches Unicode code points (ü is one
  * character), while DuckDB's rapidfuzz backend scores raw UTF-8
  * bytes (ü is two, shifting lengths, window, and prefix — verified:
  * 'über'/'uber' scores 0.8333 here vs 0.7833 in DuckDB). Character-
  * level matching is the standard definition; byte-level is an
  * implementation artifact, so the divergence is kept, not copied. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes() =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"${left.dataType}, ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"${JaroWinklerExpr.getClass.getName.stripSuffix("$")}.similarity($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {

  /** Static scorer shared by interpreted eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    // Score over Unicode code points, not bytes: byte-level matching
    // would mis-pair multi-byte characters.
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.codePointCount(0, s1.length)
    val l2 = s2.codePointCount(0, s2.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val c1 = new Array[Int](l1)
    val c2 = new Array[Int](l2)
    fillCodePoints(s1, c1)
    fillCodePoints(s2, c2)

    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && c1(i) == c2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0

    // Half-transpositions: matched sequences compared in order.
    var trans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (c1(i) != c2(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val j = (m / l1 + m / l2 + (m - trans / 2.0) / m) / 3.0

    // Winkler prefix boost, standard 0.7 gate and 4-char cap.
    if (j <= 0.7) return j
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && c1(prefix) == c2(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  private def fillCodePoints(s: String, out: Array[Int]): Unit = {
    var si = 0
    var oi = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      out(oi) = cp
      oi += 1
      si += Character.charCount(cp)
    }
  }
}
