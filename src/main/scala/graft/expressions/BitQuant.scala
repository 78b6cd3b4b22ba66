package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 1-bit-per-dimension (binary) vector quantization — the RaBitQ
  * estimator family (Gao & Long, SIGMOD 2024) re-expressed with the
  * library's exact-replay discipline: a deterministic Rademacher
  * rotation (±1 per dimension, drawn from the same portable md5 rule
  * as [[graft.sim.Similarity.srpSign]] so a SQL oracle regenerates it
  * relationally), sign-bit codes packed into ONE BIGINT (dim <= 64),
  * and the paper's per-vector correction factor that makes the
  * code-space score an unbiased cosine estimate rather than a raw
  * Hamming proxy.
  *
  * Estimator: with rotated r = D·x, code bits b_i = [r_i > 0] and
  * correction sum bsum(x) = Σ_i r_i·sgn(r_i) = Σ_i |r_i|, the cosine
  * estimate for a float query q (rotated rq = D·q) is
  *
  *   est(q, x) = (Σ_i rq_i·sgn_i(x)) · ‖x‖ / (bsum(x) · ‖q‖)
  *
  * — RaBitQ's <q̂, ō>/<x̂, ō> with the 1/√D factors cancelled. Every
  * product is a sign flip (exact in IEEE), so the only rounding
  * sequence is the ascending-index accumulation, which both this
  * expression and the DuckDB oracle perform identically.
  *
  * `graft_bq_encode(vec array<float>, salt, dim)` →
  * struct<code: bigint, bsum: double>. Null vec, wrong length, or a
  * null element → null (the corpus row is unindexable). One eval per
  * CORPUS row (the encode pass), so CodegenFallback's per-row
  * boundary is noise — same budget call as [[SrpBucketsExpr]].
  */
case class BqEncodeExpr(vec: Expression, salt: String, dim: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(vec)
  override def dataType: DataType = StructType(Seq(
    StructField("code", LongType, nullable = false),
    StructField("bsum", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes() = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (vecOk && dim >= 1 && dim <= 64)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bq_encode expects (array<float>) with 1<=dim<=64, got ${vec.dataType}, dim=$dim")
  }

  // Rademacher diagonal, ±1.0 double, from the portable md5 rule —
  // built once per task, never a plan literal.
  @transient private lazy val signs: Array[Double] =
    Array.tabulate(dim)(i =>
      graft.sim.Similarity.srpSign(salt, 0, 0, i).toDouble)

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    var code = 0L
    var bsum = 0d
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      val r = a.getFloat(i).toDouble * signs(i)
      if (r > 0d) { code |= 1L << i; bsum += r }
      else bsum += -r
      i += 1
    }
    InternalRow(code, bsum)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

/** `graft_bq_dot(rvec array<double|float>, code bigint)` — the
  * code-space half of the [[BqEncodeExpr]] estimator: the ascending-
  * index fold Σ_i rvec_i · (bit_i(code) ? +1 : −1), i.e. the dot
  * product of the ROTATED query against the corpus vector's sign
  * direction. Each product is an exact IEEE sign flip, so the fold is
  * bit-identical to DuckDB's
  * `list_reduce(list_transform(generate_series(1, n), i -> rv[i] *
  * (CASE WHEN crv[i] > 0 THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y)`.
  *
  * Null semantics follow [[DotExpr]]: null inputs or a null element →
  * null; an rvec longer than 64 elements → null (the code cannot hold
  * its bits); empty → 0.0. Real codegen — this is the per-PAIR
  * scoring hot path of the BQ shortlist join, the same
  * BroadcastNestedLoop position where the fallback boundary cost
  * [[DotExpr]] ~100× its fold.
  */
case class BqDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private val leftIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes() = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (vecOk && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bq_dot expects (array<float|double>, bigint), got ${left.dataType}, ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[Long]
    val n = x.numElements()
    if (n > 64) return null
    var acc = 0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      acc += (if (((code >>> i) & 1L) != 0L) xv else -xv)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("a")
    val c = ctx.freshName("c")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val bad = ctx.freshName("bad")
    val xv = ctx.freshName("xv")
    val arrCls = classOf[ArrayData].getName
    val get =
      if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        $arrCls $a = ${leftGen.value};
        long $c = ${rightGen.value};
        int $n = $a.numElements();
        if ($n <= 64) {
          boolean $bad = false;
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i)) { $bad = true; break; }
            double $xv = $get;
            $acc += ((($c >>> $i) & 1L) != 0L) ? $xv : -$xv;
          }
          if (!$bad) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
