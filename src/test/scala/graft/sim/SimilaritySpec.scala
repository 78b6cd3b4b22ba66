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
}
