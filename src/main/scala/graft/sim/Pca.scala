package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction companion to [[KMeans]]: compress `Array[Float]` vectors
  * to their top-k principal coordinates for cheaper storage, faster
  * ANN scoring, and decorrelated features.
  *
  * Execution shape — the covariance route, which is the only one that
  * scales when n >> dim: ONE pass over the corpus accumulates
  * (count, sum, upper-triangular Gram) per partition in flat arrays
  * (dim² doubles per PARTITION, not per row — no dim²-wide shuffle
  * rows, no O(n·dim²) exploded frame), tree-reduced to the driver.
  * The dim x dim covariance then eigendecomposes ON THE DRIVER with
  * cyclic Jacobi — dim is an embedding width (64-4096), so this is
  * microseconds-to-seconds of driver math, the spark.ml RowMatrix
  * pattern. The fitted model is k·dim doubles — broadcast-sized bytes.
  *
  * [[project]] is a pure shuffle-free projection: each output
  * coordinate is one codegen'd native dot product
  * ([[graft.expressions.DotExpr]]) against a literal component vector,
  * minus a precomputed scalar — the corpus is never joined, exploded,
  * or shuffled.
  *
  * Deterministic by construction: the Gram accumulation is reduced in
  * a fixed merge order only up to floating addition — but partition
  * sums enter at full double precision over float inputs, and the
  * Jacobi sweep count is fixed; component SIGN is canonicalized
  * (largest-|coordinate| entry made positive) so reruns agree on the
  * projection's orientation. (Bit-level cross-partitioning stability
  * of the covariance itself is sub-ulp; the spec pins behavioral
  * determinism — ordering, signs, variance ranking.)
  */
object Pca {

  /** Fitted model: `components(j)` is the j-th principal axis (unit
    * norm, descending eigenvalue), `eigenvalues(j)` its variance. */
  final case class PcaModel(n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]])

  /** One-pass mean + covariance, driver-side Jacobi, top-k axes. */
  def fit(corpus: DataFrame, vecCol: String, k: Int): PcaModel = {
    val rows = corpus.select(col(vecCol)).na.drop()
    // null-zero merge: an empty (or all-null-vector) corpus must reach
    // the require(n > 1) diagnostic below, not treeReduce's generic
    // "empty collection" throw — so aggregate with a null zero value
    // instead of reducing.
    type Partial = (Long, Array[Double], Array[Double], Int)
    def merge(a: Partial, b: Partial): Partial =
      if (a == null) b
      else if (b == null) a
      else {
        require(a._4 == b._4, s"dim mismatch ${a._4} vs ${b._4}")
        var i = 0
        while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
        i = 0
        while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
        (a._1 + b._1, a._2, a._3, a._4)
      }
    val agg = rows.rdd
      .map(_.getSeq[Float](0))
      .mapPartitions { it =>
        var cnt = 0L
        var s: Array[Double] = null
        var g: Array[Double] = null // upper triangle, row-major packed
        var d = 0
        it.foreach { v =>
          if (s == null) {
            d = v.length
            s = new Array[Double](d)
            g = new Array[Double](d * (d + 1) / 2)
          }
          require(v.length == d, s"ragged embedding: ${v.length} vs $d")
          cnt += 1
          var i = 0
          var off = 0
          while (i < d) {
            val xi = v(i).toDouble
            s(i) += xi
            var j = i
            while (j < d) { g(off + j - i) += xi * v(j); j += 1 }
            off += d - i
            i += 1
          }
        }
        if (cnt == 0) Iterator.empty
        else Iterator.single((cnt, s, g, d): Partial)
      }
      .treeAggregate(null: Partial)(merge, merge)
    require(agg != null && agg._1 > 1,
      s"need >1 vectors to fit PCA, got ${if (agg == null) 0 else agg._1}")
    val (n, sum, gram, dim) = agg
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val mean = sum.map(_ / n)
    // covariance C = E[xxT] - mean meanT (population; ranking and axes
    // are what matter, not the n vs n-1 scale convention)
    val c = Array.ofDim[Double](dim, dim)
    var off = 0
    for (i <- 0 until dim) {
      for (j <- i until dim) {
        val v = gram(off + j - i) / n - mean(i) * mean(j)
        c(i)(j) = v; c(j)(i) = v
      }
      off += dim - i
    }
    val (values, vectors) = jacobiEigen(c)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    val comps = order.map { idx =>
      val axis = vectors.map(_(idx))
      // Sign canonicalization: the largest-|coordinate| entry positive.
      val pivot = axis.indices.maxBy(i => math.abs(axis(i)))
      if (axis(pivot) < 0) axis.map(-_) else axis
    }.toArray
    PcaModel(n, mean, order.map(values).toArray, comps)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). Fixed sweep budget with
    * an off-diagonal convergence check — deterministic. */
  private[sim] def jacobiEigen(m: Array[Array[Double]],
      sweeps: Int = 32): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-12 * frobenius(a)
    while (sweep < sweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cth = 1.0 / math.sqrt(t * t + 1.0)
            val sth = t * cth
            rotate(a, v, p, q, cth, sth, d)
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- i + 1 until a.length) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s) max 1e-300
  }

  /** Apply one Jacobi rotation in the (p,q) plane to `a` (two-sided)
    * and `v` (one-sided). */
  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int, c: Double, s: Double, d: Int): Unit = {
    var i = 0
    while (i < d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < d) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }

  /** Project the embedding column onto the model's axes: output column
    * = array of k principal coordinates (float). Shuffle-free — each
    * coordinate is one native codegen'd dot product against a LITERAL
    * axis vector minus a precomputed scalar.
    *
    * `center = true` (the default) subtracts the mean — the standard
    * PCA coordinate system for features/statistics. Pass
    * `center = false` for COSINE-geometry compression (ANN): an
    * uncentered orthonormal projection approximately preserves raw dot
    * products and norms (y1·y2 = x1ᵀWWᵀx2 → x1·x2 as the subspace
    * captures the energy), whereas translating by the mean distorts
    * angles between raw vectors. */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String, center: Boolean = true): DataFrame = {
    val coords: Seq[Column] = model.components.map { axis =>
      val axisF: Array[Float] = axis.map(_.toFloat)
      val centerDot =
        if (center) axis.indices.map(i => axis(i) * model.mean(i)).sum
        else 0.0
      (call_function("graft_dot", col(vecCol), typedlit(axisF))
        - lit(centerDot)).cast("float")
    }.toSeq
    df.withColumn(outCol, array(coords: _*))
  }
}
