package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed PCA (`sim/Pca`): eigen-math against known-answer
  * matrices, fitted-axis recovery on planted data, orthonormality,
  * reconstruction-error monotonicity, partitioning invariance, and the
  * shuffle-free projection plan. */
class PcaSpec extends SparkSpec {

  import spark.implicits._

  test("jacobiEigen recovers a known symmetric spectrum") {
    // [[2,1],[1,2]] has eigenvalues 3 (axis [1,1]/√2) and 1 ([1,-1]/√2).
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-9 && math.abs(sorted(1) - 3.0) < 1e-9)
    // Eigenvector columns orthonormal.
    val dots = for (i <- 0 to 1; j <- 0 to 1) yield
      (0 to 1).map(r => vecs(r)(i) * vecs(r)(j)).sum
    assert(math.abs(dots(0) - 1) < 1e-9 && math.abs(dots(3) - 1) < 1e-9 &&
      math.abs(dots(1)) < 1e-9)
  }

  /** Planted data: points spread along direction (3,4)/5 in a 4-dim
    * space with a tiny orthogonal wiggle — the first axis must recover
    * the planted direction. */
  private def planted(n: Int) = (1 to n).map { i =>
    val t = (i % 41).toDouble - 20.0       // spread along the main axis
    val w = ((i % 7).toDouble - 3.0) * 0.01 // tiny wiggle on dim 2
    (i.toLong, Array[Float]((t * 0.6).toFloat, (t * 0.8).toFloat,
      w.toFloat, (i % 3).toFloat * 0f))
  }

  test("fit on an empty or all-null corpus raises the intended diagnostic") {
    // Pre-fix both cases died inside treeReduce with a generic
    // "empty collection" UnsupportedOperationException before reaching
    // the require(n > 1) message.
    val empty = planted(0).toDF("id", "vec")
    val e1 = intercept[IllegalArgumentException](Pca.fit(empty, "vec", 1))
    assert(e1.getMessage.contains("need >1 vectors"), e1.getMessage)
    val allNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, null), org.apache.spark.sql.Row(2L, null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("vec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val e2 = intercept[IllegalArgumentException](Pca.fit(allNull, "vec", 1))
    assert(e2.getMessage.contains("need >1 vectors"), e2.getMessage)
  }

  test("fit recovers the planted principal direction, descending variance") {
    val df = planted(2000).toDF("id", "vec")
    val m = Pca.fit(df, "vec", k = 3)
    assert(m.n == 2000)
    // Eigenvalues strictly descending (within float noise).
    assert(m.eigenvalues.toSeq.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    // First axis == (0.6, 0.8, ~0, 0) up to canonicalized sign.
    val a = m.components(0)
    assert(math.abs(a(0) - 0.6) < 1e-3 && math.abs(a(1) - 0.8) < 1e-3,
      s"axis was ${a.toSeq}")
    // Orthonormal components.
    for (i <- m.components.indices; j <- m.components.indices) {
      val dot = a.indices.map(x => m.components(i)(x) * m.components(j)(x)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)=$dot")
    }
  }

  test("reconstruction error shrinks as k grows; k = dim is lossless") {
    val recs = (1 to 500).map { i =>
      (i.toLong, Array.tabulate[Float](6)(d =>
        (math.sin(i * (d + 1) * 0.37) * (6 - d)).toFloat))
    }
    val df = recs.toDF("id", "vec")
    def err(k: Int): Double = {
      val m = Pca.fit(df, "vec", k)
      // Total squared reconstruction error = total variance - captured.
      val totalVar = {
        val full = Pca.fit(df, "vec", 6)
        full.eigenvalues.sum
      }
      totalVar - m.eigenvalues.sum
    }
    val errs = Seq(1, 2, 4, 6).map(err)
    assert(errs.sliding(2).forall(p => p(0) >= p(1) - 1e-9), s"errs=$errs")
    assert(math.abs(errs.last) < 1e-6, s"k=dim must capture everything: $errs")
  }

  test("fit is partitioning-invariant (behaviorally)") {
    val df = planted(1000).toDF("id", "vec")
    val m1 = Pca.fit(df.repartition(1), "vec", 2)
    val m8 = Pca.fit(df.repartition(8), "vec", 2)
    m1.components.zip(m8.components).foreach { case (x, y) =>
      x.indices.foreach(i => assert(math.abs(x(i) - y(i)) < 1e-9))
    }
  }

  test("PCA-compressed candidate generation + exact re-rank beats the random floor") {
    // The deployment pattern PCA compression serves in an ANN stack:
    // score CANDIDATES in the cheap reduced space (4x fewer mults),
    // re-rank only those exactly. The synthetic embeddings are nearly
    // isotropic (top-16/64 variance share ~0.38, anisotropy ~2x), the
    // WORST case for spectral compression — so the claim pinned here
    // is the honest one: the reduced space is strongly informative as
    // a candidate filter, far above random, not that 16 dims replace
    // 64.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val m = Pca.fit(emb, "vec", 16)
    // Uncentered projection: cosine compares RAW angles; an
    // orthonormal subspace projection approximately preserves them,
    // translating by the mean would not.
    val reduced = Pca.project(emb, "vec", m, "pc", center = false)
      .select(col("id"), col("pc").as("vec"))
    val queries = emb.limit(40)
    val qReduced = Pca.project(queries, "vec", m, "pc", center = false)
      .select(col("id"), col("pc").as("vec"))
    val k = 5
    val nCand = 40 // 8% of the 500-vector corpus
    val truth = Similarity.bruteForceTopK(queries, emb, k)
      .select(col("q_id"), col("n_id"))
    val candidates = Similarity.bruteForceTopK(qReduced, reduced, nCand)
      .select(col("q_id"), col("n_id"))
    // Recall of the true top-5 inside the reduced-space top-40
    // candidate set. Random candidates would catch nCand/n = 8%.
    val hits = truth.join(candidates, Seq("q_id", "n_id")).count()
    val recall = hits.toDouble / truth.count()
    assert(recall > 0.5, s"candidate recall $recall (random floor 0.08)")
  }

  test("project emits k float coordinates, shuffle-free, and centers the data") {
    val df = planted(1000).toDF("id", "vec")
    val m = Pca.fit(df, "vec", 2)
    val proj = Pca.project(df, "vec", m, "pc")
    // Plan shape on a real (non-local, non-foldable) source: the
    // projection is exchange-free and uses the native dot product.
    val onParquet = Pca.project(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "embedding",
      Pca.fit(graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
        .limit(200), "embedding", 2),
      "pc")
    val plan = onParquet.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(plan.contains("dotexpr"), s"expected the native dot product:\n$plan")
    val coords = proj.select(col("pc")).collect().map(_.getSeq[Float](0))
    assert(coords.forall(_.length == 2))
    // Projected coordinates are centered: mean ~ 0 per axis.
    val mean0 = coords.map(_(0).toDouble).sum / coords.length
    assert(math.abs(mean0) < 1e-3, s"axis-0 mean $mean0")
    // And the first axis carries (much) more spread than the second.
    def variance(i: Int) = {
      val xs = coords.map(_(i).toDouble)
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    assert(variance(0) > variance(1) * 10)
  }
}
