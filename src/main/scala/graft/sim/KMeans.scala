package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the
  * clustering companion to the IVF index (its centroids are exactly
  * what [[Similarity.ivfTopK]] wants as cells).
  *
  * Deterministic by construction: initial centroids are named corpus
  * rows (no random init), assignment ties break on centroid id
  * (via [[Similarity.assign]]), and iteration count is fixed — so
  * reruns and task retries agree.
  *
  * Scale shape per iteration: one broadcast-centroid scan for
  * assignment (no corpus shuffle), one posexplode + groupBy for the
  * element-wise means (shuffles |corpus| x dim skinny rows), and the
  * tiny centroid frame is locally checkpointed so the plan does not
  * grow with iteration count.
  */
object KMeans {

  /** One update step: corpus assigned to `centroids`, centroids
    * recomputed as member means. Returns (newCentroids, assignment). */
  def step(corpus: DataFrame, centroids: DataFrame): (DataFrame, DataFrame) = {
    val assigned = Similarity.assign(corpus, centroids)
    val sums = assigned
      .select(col("bucket"), posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy(col("bucket"), col("pos"))
      .agg(avg(col("x")).as("m"))
    val newCentroids = sums
      .groupBy(col("bucket"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m").cast("float")).as("vec"))
      .select(col("bucket").as("id"), col("vec"))
    (newCentroids, assigned)
  }

  /** `iters` Lloyd iterations from the corpus rows named by `initIds`.
    * Returns (centroids (id, vec), assignment (id, vec, bucket)) where
    * a centroid's id is the init row it descended from. */
  def fit(corpus: DataFrame, initIds: Seq[Long], iters: Int): (DataFrame, DataFrame) = {
    var centroids = corpus.filter(col("id").isin(initIds.map(Long.box): _*))
      .select(col("id"), col("vec"))
    var assignment = Similarity.assign(corpus, centroids)
    var i = 0
    while (i < iters) {
      val (next, assigned) = step(corpus, centroids)
      // k rows; eager localCheckpoint truncates the growing lineage.
      centroids = next.localCheckpoint(true)
      assignment = assigned
      i += 1
    }
    (centroids, assignment)
  }
}
