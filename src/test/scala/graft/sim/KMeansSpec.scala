package graft.sim

import graft.SparkSpec

/** K-means on three well-separated synthetic clusters: membership must
  * recover ground truth from off-center seeds, deterministically. */
class KMeansSpec extends SparkSpec {

  import spark.implicits._

  // Three clusters hugging the axes of R^3, ids encode ground truth.
  private def corpus = (0 until 30).map { i =>
    val cluster = i % 3
    val base = Array(0f, 0f, 0f)
    base(cluster) = 10f
    base((cluster + 1) % 3) = 0.1f * (i / 3) // within-cluster spread
    (i.toLong, base.toSeq)
  }.toDF("id", "vec")

  test("recovers ground-truth membership from off-center seeds") {
    val (centroids, assignment) = KMeans.fit(corpus, Seq(0L, 1L, 2L), 3)
    assert(centroids.count() == 3)
    val byBucket = assignment.collect()
      .groupBy(_.getAs[Long]("bucket"))
      .map { case (b, rows) => b -> rows.map(_.getLong(0) % 3).distinct.toSeq }
    // Every bucket is pure: all members share one ground-truth cluster.
    assert(byBucket.values.forall(_.size == 1))
    assert(byBucket.size == 3)
  }

  test("fit is deterministic across runs") {
    val a = KMeans.fit(corpus, Seq(0L, 1L, 2L), 2)._2
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("bucket"))).sorted.toSeq
    val b = KMeans.fit(corpus, Seq(0L, 1L, 2L), 2)._2
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("bucket"))).sorted.toSeq
    assert(a == b)
  }
}
