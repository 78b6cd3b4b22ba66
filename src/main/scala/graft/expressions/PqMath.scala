package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization (PQ) codebook — the FAISS-style compression
  * companion to the IVF family (Jegou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): the `dim`-dimensional
  * embedding space is split into `m` contiguous subspaces of `subDim`
  * dims each, and every subspace carries its own small codebook. A
  * vector compresses to `m` small code ids — at m=8 over 64-dim float
  * vectors that is ~8 ints instead of 256 bytes of floats, which is
  * the difference between a shuffle that moves the corpus and one
  * that moves fingerprints.
  *
  * Deterministic by construction, like the IVF centers: init codes
  * are named corpus rows, assignment is argmin of the exact L2
  * expansion `floor((c.c - 2 x.c) * 1e6 + 0.5)` (the x.x term is
  * constant per row and dropped; ties break on smaller code id),
  * refinement is the exact-integer-sum mean ([[graft.sim.KMeans]]'s
  * formula) — so a SQL oracle replays training, encoding, and every
  * distance bit-for-bit.
  *
  * All PQ dot products use PER-SUBSPACE GROUPING: an ascending-index
  * double fold within each subspace, then an ascending-s sum of the m
  * partials. (A flat fold would round differently; fixing the
  * grouping lets the symmetric path read the m partials straight out
  * of [[lut]] while staying bit-equal to the SQL mirror, which sums
  * `list_reduce` subspace dots in the same order.)
  *
  * `lut(s)` is the ks_s x ks_s code-to-code partial-dot table of
  * subspace s (flattened row-major, indexed by POSITION in the
  * id-ascending code arrays, not by code id): symmetric
  * (code,code) scoring is m lookups + m adds per pair instead of
  * `dim` multiply-adds — the ADC/SDC trick that makes compressed
  * pair scoring cheaper than the float scoring it replaces, on top
  * of the narrower shuffle.
  */
case class PqCodebook(m: Int, subDim: Int,
    codeIds: Array[Array[Int]],
    codeVecs: Array[Array[Array[Float]]],
    selfDots: Array[Array[Double]],
    lut: Array[Array[Double]]) extends Serializable {

  def dim: Int = m * subDim

  /** Per-subspace id -> position table (ids are small ints — the
    * named init-row ids — so a direct array beats scanning): built
    * once per deserialized codebook, sized max-id+1, -1 for unknown.
    * This is the hot-loop lookup — [[PqSdcDotExpr]] runs it 2m times
    * PER PAIR, where a linear scan would cost m·ks/2 compares. */
  @transient private lazy val posById: Array[Array[Int]] =
    codeIds.map { ids =>
      val t = Array.fill(ids.foldLeft(0)(math.max) + 1)(-1)
      var i = 0
      while (i < ids.length) { t(ids(i)) = i; i += 1 }
      t
    }

  /** Position of code `id` in subspace `s`, or -1. */
  def idx(s: Int, id: Int): Int = {
    val t = posById(s)
    if (id < 0 || id >= t.length) -1 else t(id)
  }
}

object PqCodebook {
  /** Ascending-index double fold — the one dot-product kernel every
    * PQ table is built from (bit-identical to [[DotExpr]]'s loop). */
  private[expressions] def foldDot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0d
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Build from per-subspace (codeId, subVec) lists: sorts each
    * subspace by code id and precomputes the self-dot and LUT
    * tables. */
  def apply(m: Int, subDim: Int,
      perSub: Array[Array[(Int, Array[Float])]]): PqCodebook = {
    require(perSub.length == m, s"expected $m subspaces, got ${perSub.length}")
    val sorted = perSub.map(_.sortBy(_._1))
    sorted.foreach(_.foreach { case (id, v) =>
      require(v.length == subDim, s"code $id has dim ${v.length} != $subDim")
    })
    val ids = sorted.map(_.map(_._1))
    val vecs = sorted.map(_.map(_._2))
    val lut = vecs.map { cs =>
      val k = cs.length
      val t = new Array[Double](k * k)
      var i = 0
      while (i < k) {
        var j = 0
        while (j < k) { t(i * k + j) = foldDot(cs(i), cs(j)); j += 1 }
        i += 1
      }
      t
    }
    val self = vecs.zip(lut).map { case (cs, t) =>
      Array.tabulate(cs.length)(i => t(i * cs.length + i))
    }
    PqCodebook(m, subDim, ids, vecs, self, lut)
  }

  /** Slice full-dim (codeId, vec) init rows into the m per-subspace
    * codebooks (every subspace starts from the same named rows). */
  def fromFullVectors(m: Int, subDim: Int,
      centers: Array[(Int, Array[Float])]): PqCodebook = {
    centers.foreach { case (id, v) =>
      require(v.length == m * subDim,
        s"init row $id has dim ${v.length} != ${m * subDim}")
    }
    apply(m, subDim, Array.tabulate(m) { s =>
      centers.map { case (id, v) =>
        id -> java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim)
      }
    })
  }
}

/** Shared shape/eval plumbing for the PQ expressions: all are
  * CodegenFallback (one boundary per row into tight compiled loops —
  * the [[TopCentersExpr]]/[[SrpBucketsExpr]] lesson: composing this
  * from per-subspace builtin columns would blow the JIT's huge-method
  * limit the moment m grows) and all carry the codebook as a
  * `Broadcast` stub, never a plan literal (codebook size is an index
  * parameter; at real scale m x ks x subDim floats stay KBs, but the
  * LUT is m x ks^2 doubles and plan literals are the wrong place for
  * either). Built via `Bridge.column` — the broadcast constructor arg
  * cannot come through the children-only `injectFunction` factory. */
trait PqExpr extends CodegenFallback { self: Expression =>
  def bc: org.apache.spark.broadcast.Broadcast[PqCodebook]
  @transient protected lazy val cb: PqCodebook = bc.value

  protected def floatArray(a: ArrayData, n: Int): Array[Float] = {
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      out(i) = a.getFloat(i)
      i += 1
    }
    out
  }

  /** codes array -> per-subspace POSITIONS, or null if any id is
    * unknown / length mismatches. */
  protected def codePositions(a: ArrayData): Array[Int] = {
    if (a.numElements() != cb.m) return null
    val out = new Array[Int](cb.m)
    var s = 0
    while (s < cb.m) {
      if (a.isNullAt(s)) return null
      val p = cb.idx(s, a.getInt(s))
      if (p < 0) return null
      out(s) = p
      s += 1
    }
    out
  }
}

/** `PqEncodeExpr(vec, bc)` -> the m code ids of `vec` (array<int>):
  * per subspace, argmin over codes of
  * `floor((c.c - 2 x.c) * 1e6 + 0.5)` with ties to the smaller code
  * id — the exact rule the SQL oracle replays. Null vec, wrong
  * length, or a null element -> null (a row that cannot encode
  * drops, mirrored by the oracle's inner joins). */
case class PqEncodeExpr(vec: Expression,
    bc: org.apache.spark.broadcast.Broadcast[PqCodebook])
    extends Expression with PqExpr {

  override def children: Seq[Expression] = Seq(vec)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PqEncodeExpr expects array<float>, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != cb.dim) return null
    val x = floatArray(a, cb.dim)
    if (x == null) return null
    val out = new Array[Int](cb.m)
    var s = 0
    while (s < cb.m) {
      val codes = cb.codeVecs(s)
      val self = cb.selfDots(s)
      val off = s * cb.subDim
      var best = -1
      var bestScore = Double.PositiveInfinity
      var ci = 0
      while (ci < codes.length) {
        val c = codes(ci)
        var acc = 0d
        var i = 0
        while (i < cb.subDim) { acc += x(off + i).toDouble * c(i).toDouble; i += 1 }
        val score = math.floor((self(ci) - 2d * acc) * 1e6 + 0.5)
        if (score < bestScore) { bestScore = score; best = ci }
        ci += 1
      }
      if (best < 0) return null
      out(s) = cb.codeIds(s)(best)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

/** `PqDecodeExpr(codes, bc)` -> the reconstruction (array<float>):
  * subspace code vectors concatenated in subspace order. Null codes /
  * unknown id -> null. */
case class PqDecodeExpr(codes: Expression,
    bc: org.apache.spark.broadcast.Broadcast[PqCodebook])
    extends Expression with PqExpr {

  override def children: Seq[Expression] = Seq(codes)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = codes.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PqDecodeExpr expects array<int>, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val c = codes.eval(input)
    if (c == null) return null
    val pos = codePositions(c.asInstanceOf[ArrayData])
    if (pos == null) return null
    val out = new Array[Float](cb.dim)
    var s = 0
    while (s < cb.m) {
      System.arraycopy(cb.codeVecs(s)(pos(s)), 0, out, s * cb.subDim, cb.subDim)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(codes = newChildren(0))
}

/** `PqAdcDotExpr(qvec, codes, bc)` -> double: the asymmetric
  * (float query x coded candidate) PQ dot — per-subspace folds of
  * `q` against the candidate's code vectors, summed ascending-s.
  * Exactly `pqDot(q, decode(codes))` without materializing the
  * reconstruction. */
case class PqAdcDotExpr(qvec: Expression, codes: Expression,
    bc: org.apache.spark.broadcast.Broadcast[PqCodebook])
    extends Expression with PqExpr {

  override def children: Seq[Expression] = Seq(qvec, codes)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (qvec.dataType, codes.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"PqAdcDotExpr expects (array<float>, array<int>), got ($a, $b)")
    }

  override def eval(input: InternalRow): Any = {
    val q = qvec.eval(input)
    val c = codes.eval(input)
    if (q == null || c == null) return null
    val qa = q.asInstanceOf[ArrayData]
    if (qa.numElements() != cb.dim) return null
    val x = floatArray(qa, cb.dim)
    if (x == null) return null
    val pos = codePositions(c.asInstanceOf[ArrayData])
    if (pos == null) return null
    var total = 0d
    var s = 0
    while (s < cb.m) {
      val cv = cb.codeVecs(s)(pos(s))
      val off = s * cb.subDim
      var acc = 0d
      var i = 0
      while (i < cb.subDim) { acc += x(off + i).toDouble * cv(i).toDouble; i += 1 }
      total += acc
      s += 1
    }
    total
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(qvec = newChildren(0), codes = newChildren(1))
}

/** `PqSdcDotExpr(codesA, codesB, bc)` -> double: the symmetric
  * (coded x coded) PQ dot — m LUT lookups summed ascending-s, no
  * multiplications at all. Bit-equal to
  * `pqDot(decode(codesA), decode(codesB))` because each LUT entry IS
  * that subspace's ascending fold. */
case class PqSdcDotExpr(codesA: Expression, codesB: Expression,
    bc: org.apache.spark.broadcast.Broadcast[PqCodebook])
    extends Expression with PqExpr {

  override def children: Seq[Expression] = Seq(codesA, codesB)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (codesA.dataType, codesB.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"PqSdcDotExpr expects (array<int>, array<int>), got ($a, $b)")
    }

  override def eval(input: InternalRow): Any = {
    val a = codesA.eval(input)
    val b = codesB.eval(input)
    if (a == null || b == null) return null
    // Fused allocation-free loop: this runs once per CANDIDATE PAIR
    // (the quadratic stage), so no intermediate position arrays.
    val pa = a.asInstanceOf[ArrayData]
    val pb = b.asInstanceOf[ArrayData]
    if (pa.numElements() != cb.m || pb.numElements() != cb.m) return null
    var total = 0d
    var s = 0
    while (s < cb.m) {
      if (pa.isNullAt(s) || pb.isNullAt(s)) return null
      val ia = cb.idx(s, pa.getInt(s))
      val ib = cb.idx(s, pb.getInt(s))
      if (ia < 0 || ib < 0) return null
      total += cb.lut(s)(ia * cb.codeIds(s).length + ib)
      s += 1
    }
    total
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(codesA = newChildren(0), codesB = newChildren(1))
}

/** `PqNormExpr(codes, bc)` -> double: the reconstruction's norm,
  * `sqrt(sum_s selfDot(s, code_s))` — the per-subspace-grouped
  * `sqrt(pqDot(recon, recon))`, m lookups per row. Computed once per
  * VECTOR (pre-shuffle) so pair scoring never recomputes it. */
case class PqNormExpr(codes: Expression,
    bc: org.apache.spark.broadcast.Broadcast[PqCodebook])
    extends Expression with PqExpr {

  override def children: Seq[Expression] = Seq(codes)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = codes.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PqNormExpr expects array<int>, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val c = codes.eval(input)
    if (c == null) return null
    val pos = codePositions(c.asInstanceOf[ArrayData])
    if (pos == null) return null
    var total = 0d
    var s = 0
    while (s < cb.m) { total += cb.selfDots(s)(pos(s)); s += 1 }
    math.sqrt(total)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(codes = newChildren(0))
}
