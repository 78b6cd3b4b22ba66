package graft.sim

import graft.SparkSpec

/** Cosine / top-k / IVF semantics on hand-checkable vectors. */
class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("id", "vec")

  test("cosineScaled: identical -> 1e6, orthogonal -> 0, opposite -> -1e6") {
    val v = vecs(
      1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f),
      3L -> Seq(0f, 1f), 4L -> Seq(-1f, 0f))
    val out = Similarity.bruteForceTopK(v.filter($"id" === 1), v, 3)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(out(2L) == 1000000L && out(3L) == 0L && out(4L) == -1000000L)
  }

  test("bruteForceTopK ranks by score then id, k bounds output") {
    val v = vecs(
      1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(0.9f, 0.1f),
      4L -> Seq(0f, 1f), 5L -> Seq(-1f, 0f))
    val out = Similarity.bruteForceTopK(v.filter($"id" === 1), v, 2)
      .collect().sortBy(_.getLong(1)).map(_.getLong(2))
    assert(out.toSeq == Seq(2L, 3L))
  }

  test("knnGraphExact is bit-equal to the join+window brute force on real embeddings") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
      .limit(200)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val native = Similarity.knnGraphExact(v, 3).collect().map(key).sorted
    val joined = Similarity.bruteForceTopK(v, v, 3).collect().map(key).sorted
    assert(native.sameElements(joined))
  }

  test("knnGraphExact: ties break by ascending id; self excluded; k bounds output") {
    val v = vecs(
      1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(1f, 0f),
      4L -> Seq(0f, 1f))
    val rows = Similarity.knnGraphExact(v, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // No row is its own neighbour, every query emits exactly k = 2.
    assert(rows.forall { case (q, _, n, _) => q != n })
    assert(rows.groupBy(_._1).forall(_._2.length == 2))
    // For query 1, the two score-1e6 ties (2 and 3) rank by id.
    val q1 = rows.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(q1 == Seq(2L, 3L))
  }

  test("planesFor pins occupancy: monotone in n, floors at minPlanes, " +
      "reproduces the sf1-proven 10-plane setting") {
    // The r9 soak hand-derived 10 planes for the ~200k-vector sf1
    // corpus; the rule must land exactly there.
    assert(Similarity.planesFor(200000L) == 10)
    // sf0.1 (~20k augmented) and sf0.01 (~2k, clamped to the floor).
    assert(Similarity.planesFor(20000L) == 7)
    assert(Similarity.planesFor(2000L) == 4)
    // Monotone, never past long bits; occupancy stays pinned.
    val ps = Seq(1L, 1000L, 100000L, 10000000L, 1000000000L)
      .map(Similarity.planesFor(_))
    assert(ps == ps.sorted && ps.last <= 62)
    ps.zip(Seq(1L, 1000L, 100000L, 10000000L, 1000000000L)).foreach {
      case (p, n) => assert(p == 4 || (n >> p) <= 256L,
        s"occupancy not pinned at n=$n planes=$p")
    }
  }

  test("knnGraphExact refuses a corpus over the driver-collect guard, " +
      "naming the scale paths") {
    val v = vecs((1L to 50L).map(i => i -> Seq(i.toFloat, 1f)): _*)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnGraphExact(v, 3, maxCollectRows = 10L)
    }
    assert(e.getMessage.contains("knnGraphTopK") &&
      e.getMessage.contains("srpKnnGraph") &&
      e.getMessage.contains("50 rows"), e.getMessage)
    // At or under the guard it still runs.
    assert(Similarity.knnGraphExact(v, 3, maxCollectRows = 50L)
      .limit(1).count() == 1L)
  }

  test("knn_graph_ivf (the registered √n-cell query) beats random probing >= 3x") {
    // The synthetic embeddings are STRUCTURELESS (same-label mean
    // cosine ~0.004), and on uniform random vectors any IVF's recall
    // is bounded by the probed corpus fraction — that is a property
    // of the data, not the index. The meaningful guard here is that
    // the trained cells beat random cell-probing by a wide margin
    // (they do: ~5x); the >= 80% recall claim on CLUSTERED data — the
    // realistic embedding shape — is the separate test below.
    val dir = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(graft.queries.SimQueries.queries("knn_graph_brute")(spark, dir))
    val ivf = pairs(graft.queries.SimQueries.queries("knn_graph_ivf")(spark, dir))
    val recall = (exact & ivf).size.toDouble / exact.size
    val n = exact.map(_._1).size.toDouble // queries = corpus (augmented)
    val probeFraction = 2.0 / math.max(8L, math.sqrt(n).round).toDouble
    assert(recall >= 3 * probeFraction,
      s"recall $recall vs random-probing baseline $probeFraction")
  }

  test("trained IVF (KMeans centroids) recalls >= 80% of brute-force kNN") {
    // Clustered corpus (the realistic embedding shape): 10 centers in
    // R^8, 20 members each, deterministic seeded noise.
    val rnd = new scala.util.Random(42)
    val trueCenters = Array.fill(10)(Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    val rows = (0 until 200).map { i =>
      val c = trueCenters(i % 10)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq)
    }
    val v = rows.toDF("id", "vec")
    val k = 3
    val brute = Similarity.bruteForceTopK(v, v, k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val centers = KMeans.fitCenters(v, 0L until 8L, iters = 2)
    val ivf = Similarity.knnGraphTopK(v, centers, k, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
    // And the index is genuinely partitioned: no query scored the whole corpus.
    assert(ivf.size <= brute.size + 0) // top-k bounded per query
  }

  test("trained-cell near-dup blocking is sound and recalls >= 80% of threshold pairs") {
    val rnd = new scala.util.Random(7)
    val cs = Array.fill(8)(Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    val rows = (0 until 160).map { i =>
      val c = cs(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f).toSeq)
    }
    val v = rows.toDF("id", "vec")
    val thr = 950000L
    // Ground truth: all pairs with scaled cosine >= threshold.
    val w = Similarity.bruteForceTopK(v, v, 200) // k > n: every scored pair
      .filter($"score_c" >= thr && $"q_id" < $"n_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val centers = KMeans.fitCenters(v, 0L until 8L, iters = 2)
    val assigned = Similarity.assignByCenters(v, centers)
    val a = assigned.select($"bucket", $"id".as("id_a"), $"vec".as("vec_a"))
    val b = assigned.select($"bucket".as("bb"), $"id".as("id_b"), $"vec".as("vec_b"))
    val blocked = a.join(b, $"bucket" === $"bb" && $"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        Similarity.cosineScaled($"vec_a", $"vec_b").as("s"))
      .filter($"s" >= thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(w), "blocking must never invent pairs")
    assert(w.nonEmpty)
    val recall = (w & blocked).size.toDouble / w.size
    assert(recall >= 0.8, s"recall $recall over ${w.size} true pairs")
  }

  test("srpNearDuplicates recovers planted high-cosine pairs (banding recall)") {
    val rnd = new scala.util.Random(7)
    // 80 random 64-dim vectors plus a lightly perturbed twin for each
    // of the first 30 (cosine ~0.999) — the high-similarity regime LSH
    // banding is built for (see the operator doc's collision math).
    val base = (0 until 80).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val twins = base.take(30).map { case (i, a) =>
      (i + 1000L, a.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }
    val v = (base ++ twins).map { case (i, a) => (i, a.toSeq) }.toDF("id", "vec")
    val thr = 950000L
    val truth = Similarity.bruteForceTopK(v, v, 200) // k > n: all scored pairs
      .filter($"score_c" >= thr && $"q_id" < $"n_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val found = Similarity
      .srpNearDuplicates(v, dim = 64, bands = 4, planes = 6, minScoreC = thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(truth), "blocking must never invent pairs")
    assert(truth.size >= 20, s"expected the planted twins in truth: ${truth.size}")
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall over ${truth.size} true pairs")
  }

  test("srpTopK finds each planted twin as its query's top neighbour") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 60).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val twins = base.take(20).map { case (i, a) =>
      (i + 1000L, a.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }
    val corpus = (base ++ twins).map { case (i, a) => (i, a.toSeq) }
      .toDF("id", "vec")
    val queries = corpus.filter($"id" < 20)
    val out = Similarity
      .srpTopK(queries, corpus, dim = 64, bands = 4, planes = 6, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // Each query's twin (cosine ~0.999) should surface as rank 1 for
    // nearly every query — banding at 4x6 catches ~0.9999 of pairs
    // this similar; random 64-dim vectors sit near orthogonal.
    val hits = (0L until 20L).count(q => out.get(q).contains(q + 1000L))
    assert(hits >= 16, s"twin recall $hits/20: $out")
  }

  test("IVF assigns to nearest centroid and searches only the bucket") {
    // Two clear clusters around e1 and e2; centroids are one member of each.
    val v = vecs(
      1L -> Seq(1f, 0.01f), 2L -> Seq(1f, 0.02f), 3L -> Seq(0.99f, 0f),
      10L -> Seq(0.01f, 1f), 11L -> Seq(0f, 1f))
    val centroids = v.filter($"id" === 3 || $"id" === 11)
    val out = Similarity.ivfTopK(v.filter($"id" === 1), v, centroids, 10)
      .collect().map(_.getLong(2)).toSet
    assert(out == Set(2L, 3L)) // bucket-local: the e2 cluster never scored
  }

  test("semdedup: exactly one keeper per cluster, keeper is the cluster min, " +
      "full coverage") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val r = graft.queries.SimQueries.queries("semdedup")(spark, dir).cache()
    try {
      val n = graft.Tables.embeddings(spark, dir).count()
      assert(r.count() == n, "every vector gets a verdict")
      val perCluster = r.groupBy($"cluster")
        .agg(sum($"keep").as("kept"), min($"id").as("min_id"),
          max(when($"keep" === 1L, $"id")).as("keeper"))
      assert(perCluster.filter($"kept" =!= 1L).count() == 0,
        "exactly one keeper per cluster")
      assert(perCluster.filter($"keeper" =!= $"min_id").count() == 0,
        "the keeper is the deterministic cluster minimum")
      // The prune is real at this sf: some cluster has >= 2 members.
      assert(r.filter($"keep" === 0L).count() > 0)
    } finally r.unpersist()
  }

  test("rankedCellsBroadcast is bit-equal to the literal path (dispatch is pure plumbing)") {
    // 40 centers > LiteralCentersMax, so the registered queries would
    // take the broadcast path here — this pins it to the literal
    // path's output bit for bit (ids, buckets, ranks, norms).
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centers = KMeans.fitCenters(v, 0L until 40L, iters = 1)
    assert(centers.length > Similarity.LiteralCentersMax)
    val litDf = Similarity.rankedCellsLit(v, centers, 2)
    val bcDf = Similarity.rankedCellsBroadcast(v, centers, 2)
    assert(litDf.count() == bcDf.count())
    assert(litDf.exceptAll(bcDf).count() == 0 &&
      bcDf.exceptAll(litDf).count() == 0,
      "broadcast-handle assignment diverged from the literal path")
  }

  test("two-level index: groups partition fine centers under the argmax INIT " +
      "slice; coarse centers are the refined group means") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val fine = KMeans.fitCenters(v, 0L until 40L, iters = 1)
    val idx = Similarity.buildTwoLevelIndex(fine, 6)
    val fineIds = fine.map(_._1).sorted.toSeq
    // Coarse ids descend from the 6 lowest-id fine centers.
    assert(idx.coarse.ids.toSeq == fineIds.take(6))
    val memberIds = idx.groups.values.flatMap(_.ids).toSeq.sorted
    assert(memberIds == fineIds, "groups must partition the fine centers")
    // Every member sits in the group of its argmax INIT-coarse center
    // (the lowest-id slice — ties by smaller coarse id), and each
    // refined coarse vector is the exact-integer-sum mean of its
    // group's members (the hub-cell fix: the mean is not any member).
    val fineById = fine.toMap
    val init = fine.sortBy(_._1).take(6)
    val initNorms = init.map(c => Similarity.normLocal(c._2))
    idx.groups.foreach { case (g, cs) =>
      cs.ids.foreach { id =>
        val vec = fineById(id)
        val vn = Similarity.normLocal(vec)
        val best = init.indices.maxBy { i =>
          (Similarity.scoreCLocal(vec, vn, init(i)._2, initNorms(i)), -i)
        }
        assert(init(best)._1 == g,
          s"fine center $id grouped under $g, argmax says ${init(best)._1}")
      }
      val gi = idx.coarse.ids.indexOf(g)
      val members = cs.ids.map(fineById)
      val expectedMean = Array.tabulate(members.head.length) { i =>
        val s = members.map(m => math.floor(m(i).toDouble * 1e9 + 0.5).toLong).sum
        (s.toDouble / 1e9 / members.length).toFloat
      }
      assert(idx.coarse.vecs(gi).toSeq == expectedMean.toSeq,
        s"refined coarse $g is not the exact group mean")
    }
  }

  test("rankedCellsTwoLevel matches a driver-side replay of the coarse->fine rule") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val fine = KMeans.fitCenters(v, 0L until 40L, iters = 1)
    val idx = Similarity.buildTwoLevelIndex(fine, 6)
    val out = Similarity.rankedCellsTwoLevel(v, idx, 2).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(4)).map(_.getLong(3)).toSeq
      }
    val expected = v.collect().map { r =>
      val id = r.getLong(0)
      val vec = r.getSeq[Float](1).toArray
      val vn = Similarity.normLocal(vec)
      val ci = idx.coarse.ids.indices.maxBy { i =>
        (Similarity.scoreCLocal(vec, vn, idx.coarse.vecs(i),
          idx.coarse.norms(i)), -i)
      }
      val g = idx.groups(idx.coarse.ids(ci))
      val ranked = g.ids.indices
        .map(i => (Similarity.scoreCLocal(vec, vn, g.vecs(i), g.norms(i)), i))
        .sortBy { case (s, i) => (-s, i) }
        .take(2).map { case (_, i) => g.ids(i) }
      id -> ranked.toSeq
    }.toMap
    assert(out == expected)
  }

  test("knnGraphTopKAuto: engine-chosen dispatch is exactly the flat path " +
      "below FlatCentersMax and exactly the two-level path past a forced " +
      "bound — deterministic in |centers| alone") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centers = KMeans.fitCenters(v, 0L until 16L, iters = 1)
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame, what: String): Unit = {
      assert(a.count() == b.count() && a.count() > 0, what)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what: dispatch changed rows")
    }
    // |centers| = 16 <= 2048: the engine must pick the exact flat path.
    same(Similarity.knnGraphTopKAuto(v, centers, 3, nprobe = 2),
      Similarity.knnGraphTopK(v, centers, 3, nprobe = 2), "flat side")
    // Forced bound 8 < 16: the engine must pick the two-level path
    // with the shared n^(1/4) coarse sizing.
    same(Similarity.knnGraphTopKAuto(v, centers, 3, nprobe = 2, flatMax = 8),
      Similarity.knnGraphTopKTwoLevel(v, centers,
        Similarity.coarseKFor(centers.length), 3, nprobe = 2),
      "two-level side")
  }

  test("knnGraphTopKPayloadAuto: engine-chosen payload is exactly the " +
      "float path under FloatPayloadBytesMax and exactly the PQ path " +
      "past a forced bound — deterministic in (n, dim) alone") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centers = KMeans.fitCenters(v, 0L until 16L, iters = 1)
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame, what: String): Unit = {
      assert(a.count() == b.count() && a.count() > 0, what)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what: dispatch changed rows")
    }
    // Fixture payload (n x dim x 4 B) is far under 2 GiB: the engine
    // must keep the exact float exchange.
    same(Similarity.knnGraphTopKPayloadAuto(v, centers, 3, nprobe = 2),
      Similarity.knnGraphTopK(v, centers, 3, nprobe = 2), "float side")
    // Forced 1-byte budget: the engine must flip the SAME trained
    // cells to the codes-only exchange with a corpus-fit codebook.
    same(Similarity.knnGraphTopKPayloadAuto(v, centers, 3, nprobe = 2,
        payloadMax = 1L),
      Similarity.knnGraphTopKPq(v, centers,
        graft.sim.Pq.fitCodebooks(v), 3, nprobe = 2),
      "PQ side")
  }

  test("assignerFor: engine-chosen assignment builder is exactly " +
      "assignByCenters below FlatCentersMax and exactly assignByTwoLevel " +
      "past a forced bound — deterministic in |centers| alone") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centers = KMeans.fitCenters(v, 0L until 16L, iters = 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16 <= 2048: flat assignment, bit-equal.
    assert(rows(Similarity.assignerFor(centers)(v)) ==
      rows(Similarity.assignByCenters(v, centers)), "flat side")
    // Forced bound 8 < 16: coarse->fine assignment with the shared
    // n^(1/4) sizing, bit-equal.
    val idx = Similarity.buildTwoLevelIndex(centers,
      Similarity.coarseKFor(centers.length))
    assert(rows(Similarity.assignerFor(centers, flatMax = 8)(v)) ==
      rows(Similarity.assignByTwoLevel(v, idx)), "two-level side")
  }

  test("knnGraphTopKFullAuto: all FOUR quadrants of the composed " +
      "(strategy x payload) dispatch are exactly their operators") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centers = KMeans.fitCenters(v, 0L until 16L, iters = 1)
    val coarseK = Similarity.coarseKFor(centers.length)
    val cb = graft.sim.Pq.fitCodebooks(v)
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame, what: String): Unit = {
      assert(a.count() == b.count() && a.count() > 0, what)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what: dispatch changed rows")
    }
    def auto(flatMax: Int, payloadMax: Long) =
      Similarity.knnGraphTopKFullAuto(v, centers, 3, nprobe = 2,
        flatMax = flatMax, payloadMax = payloadMax)
    val big = Long.MaxValue
    same(auto(2048, big),
      Similarity.knnGraphTopK(v, centers, 3, nprobe = 2),
      "flat x float")
    same(auto(8, big),
      Similarity.knnGraphTopKTwoLevel(v, centers, coarseK, 3, nprobe = 2),
      "two-level x float")
    same(auto(2048, 1L),
      Similarity.knnGraphTopKPq(v, centers, cb, 3, nprobe = 2),
      "flat x PQ")
    same(auto(8, 1L),
      Similarity.knnGraphTopKTwoLevelPq(v, centers, coarseK, cb, 3, nprobe = 2),
      "two-level x PQ")
  }

  test("nprobeFor: uniform histogram reproduces the recall-gated " +
      "nprobe=2, a hub histogram declines the second probe, a huge " +
      "target clamps at MaxAutoProbe — deterministic in the histogram " +
      "alone") {
    // Uniform: 1000 rows in 100 equal cells of 10. Weighted mean =
    // unweighted mean = 10; the two-mean-cells target (20) needs
    // exactly the proven second probe.
    val uniformSumsq = 100L * 10 * 10
    assert(Similarity.targetCandidatesFor(1000, 100) == 20L)
    assert(Similarity.nprobeFor(1000, 100, uniformSumsq, 20L) == 2)
    // Hub: one 450-row cell + 99 cells of ~5.6. A query lands in the
    // hub with p=0.45, so the WEIGHTED mean (~206) already exceeds the
    // target — the engine declines to double the hub's O(p²) pair work.
    val hubSumsq = 450L * 450 + 99L * 6 * 6
    assert(Similarity.nprobeFor(1000, 100, hubSumsq, 20L) == 1)
    // Fragmented/starved: a target the histogram can never deliver
    // stops at the clamp, not in an unbounded probe spiral.
    assert(Similarity.nprobeFor(1000, 100, uniformSumsq, Long.MaxValue) ==
      Similarity.MaxAutoProbe)
  }

  test("probeFor: forced target bounds flip the live choice on both " +
      "sides, and the fixture's near-uniform trained histogram lands " +
      "on the pinned production setting") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centers = KMeans.fitCenters(v, 0L until 16L, iters = 1)
    // A 1-candidate target is met by the landing cell alone.
    assert(Similarity.probeFor(v, centers, Some(1L)) == 1)
    // An unreachable target climbs to the clamp.
    assert(Similarity.probeFor(v, centers, Some(Long.MaxValue)) ==
      Similarity.MaxAutoProbe)
    // The engine default on the real trained histogram: the fixture's
    // cells are near-uniform (weighted mean < 2x unweighted), so the
    // rule must land exactly on the recall-gated nprobe=2 — the
    // premise of knn_graph_probe_auto's pinned oracle.
    assert(Similarity.probeFor(v, centers) == 2)
    val (n, k, s) = Similarity.cellStats(
      Similarity.assignByCenters(v, centers))
    assert(n > 0 && k > 0 && s >= n, s"degenerate stats ($n, $k, $s)")
  }

  test("selfPairsByBucket: forced tiny cap is bit-identical to the unsplit " +
      "self-join (ordered pairs, self-pairs included, no dup/loss)") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centers = KMeans.fitCenters(v, 0L until 4L, iters = 1)
    val assigned = Similarity.assignByCenters(v, centers)
    def pairs(cap: Int) =
      Similarity.selfPairsByBucket(assigned, Seq("bucket"), cap = cap)
        .select($"id_a", $"id_b")
    val split = pairs(3)
    val whole = pairs(1 << 30)
    assert(split.count() == whole.count())
    assert(split.exceptAll(whole).count() == 0 &&
      whole.exceptAll(split).count() == 0,
      "bucket splitting changed the pair set — it must be partitioning-only")
  }

  test("hot-cell split: with the hot branch ALIVE (forced tiny cap), the " +
      "ranking scan still materializes once — reuse is not an artifact of " +
      "AQE deleting an empty hot side") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centers = KMeans.fitCenters(v, 0L until 8L, iters = 1)
    val df = Similarity.knnFromRanked(
      Similarity.rankedCellsBroadcast(v, centers, 2), 3, cellCap = 4)
    val qe = df.queryExecution
    qe.toRdd.count()
    val finalPlan = qe.executedPlan.treeString.split("== Initial Plan ==")(0)
    def n(s: String) = s.r.findAllIn(finalPlan).length
    // In the final adaptive plan the one materialized exchange may
    // itself print as a ReusedExchange reference (its defining stage
    // is not re-printed), so assert "at most one non-reused mention,
    // and reuse actually fired" rather than an exact count.
    val materialized = n("REPARTITION_BY_COL") - n("ReusedExchange")
    assert(materialized <= 1 && n("ReusedExchange") >= 1,
      s"hot-branch-alive plan materialized the scan $materialized times:\n" +
        finalPlan)
  }

  test("hot-cell split: a forced tiny cap produces bit-identical kNN output " +
      "to the unsplit plan") {
    val v = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val centers = KMeans.fitCenters(v, 0L until 8L, iters = 1)
    // cap 4 forces every cell to split into many parts; cap 1<<30
    // disables splitting entirely (s = 1 everywhere).
    def run(cap: Int) = Similarity.knnFromRanked(
      Similarity.rankedCellsBroadcast(v, centers, 2), 3, cellCap = cap)
    val split = run(4)
    val whole = run(1 << 30)
    assert(split.count() == whole.count())
    assert(split.exceptAll(whole).count() == 0 &&
      whole.exceptAll(split).count() == 0,
      "cell splitting changed results — it must be partitioning-only")
  }

  test("srpBuckets: one-pass SrpBucketsExpr form is bit-identical to the " +
      "per-band union form, including null/short-vec edge rows") {
    // Real embeddings plus the edge rows the composed form's
    // when(null > 0, bit).otherwise(0) semantics defined: a NULL vec
    // and a WRONG-LENGTH vec both land in bucket 0 of every band.
    val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val edges = Seq(
      (100000L, null.asInstanceOf[Array[Float]]),
      (100001L, Array(1f, -2f, 3f))).toDF("id", "vec")
    val v = base.unionByName(edges)
    def run(op: Boolean) =
      Similarity.srpBuckets(v, 64, 4, 7, "srp", onePass = op).collect().toSet
    val onePass = run(true)
    val union = run(false)
    assert(onePass == union,
      s"forms diverge: onlyOnePass=${(onePass -- union).take(3)} " +
        s"onlyUnion=${(union -- onePass).take(3)}")
    assert(onePass.exists(r => r.getLong(0) == 100000L && r.getLong(4) == 0L),
      "null vec must land in bucket 0 (composed-form edge semantics)")
  }
}
