package graft.sim

import graft.SparkSpec
import graft.tools.RecallProbe

/** Measured ANN retrieval quality, gated.
  *
  * Two corpora, two claims:
  *
  *  1. On a CLUSTERED corpus (the realistic embedding shape — real
  *     text/image embeddings have neighborhood structure), the
  *     scale-rule-parameterized indexes (planes = planesFor(n), cells
  *     ≈ √n, nprobe 2) recall >= 0.8 of the exact top-k. The
  *     parameters come from the ENGINE RULES, not hand tuning — the
  *     same rules the registry queries and the sf1 soak use.
  *
  *  2. On the driver's SYNTHETIC testdata embeddings, recall is
  *     structurally low FOR EVERY sublinear index: the vectors are
  *     i.i.d. uniform (measured same-label cosine ≈ random-pair
  *     cosine ≈ 0), so a query's true top-k is barely more similar
  *     than the bulk and no locality-sensitive structure can separate
  *     it without scanning everything — the curse-of-dimensionality
  *     regime. What CAN be gated there is the engine rule's sanity:
  *     occupancy-pinned banding (planesFor) must not score WORSE than
  *     the fixed scaled banding it replaces, because coarser buckets
  *     at small n mean strictly more candidates per query. SCALE.md
  *     carries the measured sf1 table with this analysis. */
class RecallSpec extends SparkSpec {

  import spark.implicits._

  test("scale-rule-parameterized ANN recalls >= 0.8 of exact top-10 " +
      "on a clustered corpus") {
    // 40 centers in R^64, 50 members each (n = 2000), tight seeded
    // noise: clusters are real but overlapping enough that the index
    // has to work (in-cluster cosine ~0.9, cross ~0).
    val rnd = new scala.util.Random(1234)
    val centers = Array.fill(40)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val rows = (0 until 2000).map { i =>
      val c = centers(i % 40)
      (i.toLong,
        c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.3f).toSeq)
    }
    val v = rows.toDF("id", "vec")
    val k = 10
    val exact = Similarity.bruteForceTopK(v, v, k)

    val planes = Similarity.planesFor(2000L) // the engine rule: 4
    val srp = Similarity.srpKnnGraph(v, 64, bands = 4, planes = planes, k = k)
    val srpRecall = RecallProbe.recallAt(exact, srp)
    assert(srpRecall >= 0.8, s"srp recall $srpRecall (planes=$planes)")

    val km = KMeans.fitCenters(v, 0L until 45L, iters = 1) // ~sqrt(2000)
    val ivf = Similarity.knnGraphTopK(v, km, k, nprobe = 2)
    val ivfRecall = RecallProbe.recallAt(exact, ivf)
    assert(ivfRecall >= 0.8, s"ivf recall $ivfRecall")

    // The ENGINE-CHOSEN probe count must hit the same recall band on
    // the clustered corpus — the outcome contract of knn_graph_probe_auto:
    // the histogram rule may pick whatever probe count delivers the
    // target candidate volume, but what it delivers is gated recall.
    val pAuto = Similarity.probeFor(v, km)
    val ivfAuto = Similarity.knnGraphTopK(v, km, k, nprobe = pAuto)
    val autoRecall = RecallProbe.recallAt(exact, ivfAuto)
    assert(autoRecall >= 0.8, s"probe-auto recall $autoRecall (nprobe=$pAuto)")
  }

  test("on the structureless testdata embeddings, occupancy-pinned " +
      "banding never scores below the fixed scaled banding") {
    val dir = "/root/testdata/sf0.01"
    val corpus = graft.queries.SimQueries.augmentedVectors(spark, dir)
    val n = corpus.count()
    val sample = corpus.filter(org.apache.spark.sql.functions.col("id") % 20 === 0)
    val exact = Similarity.bruteForceTopK(sample, corpus, 10)
    def sampled(df: org.apache.spark.sql.DataFrame) =
      df.filter(org.apache.spark.sql.functions.col("q_id") % 20 === 0)
    val auto = RecallProbe.recallAt(exact, sampled(
      Similarity.srpKnnGraph(corpus, 64, 4, Similarity.planesFor(n), 10)))
    val scaled = RecallProbe.recallAt(exact, sampled(
      Similarity.srpKnnGraph(corpus, 64, 4, planes = 10, k = 10)))
    assert(auto >= scaled,
      s"engine-chosen banding (recall $auto) must not lose to the " +
        s"fixed 10-plane setting (recall $scaled) at n=$n")
  }

  test("the REGISTERED clustered-recall query (ann_recall_clustered) gates >= 0.8") {
    // The same number the CORRECTNESS row hash-pins, machine-gated
    // here: the registered query measures trained-IVF recall on the
    // deterministic clustered fixture; the contract is >= 0.8.
    val r = graft.queries.SimQueries.queries("ann_recall_clustered")(
      spark, "/root/testdata/sf0.001").head()
    val (nTruth, nHit, ppm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTruth == 600L, s"truth set should be 200 queries x 3: $nTruth")
    assert(ppm >= 800000L, s"clustered recall $nHit/$nTruth = $ppm ppm < 0.8")
  }
}
