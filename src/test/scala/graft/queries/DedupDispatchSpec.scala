package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Differential proof of the incremental dedup family's engine-chosen
  * dispatchers: on both sides of every forced bound the dispatch must
  * BE the corresponding forced-branch operator — same rows, nothing
  * lost, nothing invented. Mirrors `SimilaritySpec`'s differentials
  * for the kNN-graph family (`knnGraphTopKAuto` /
  * `knnGraphTopKPayloadAuto` / `knnGraphTopKFullAuto`). */
class DedupDispatchSpec extends SparkSpec {

  import spark.implicits._

  private def vectors: DataFrame =
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"), $"embedding".as("vec"))

  private def same(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.count() == b.count() && a.count() > 0, what)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"$what: dispatch changed rows")
  }

  test("embeddingDedupPayloadAutoIncrOver: exactly the float maintenance " +
      "path under FloatPayloadBytesMax and exactly the PQ path past a " +
      "forced bound — deterministic in (n, dim) alone") {
    val all = vectors
    // Fixture payload (n x dim x 4 B) is far under 2 GiB: the engine
    // must keep the exact float pair exchange.
    same(SimQueries.embeddingDedupPayloadAutoIncrOver(all),
      SimQueries.incrementalDedupOver(all, SimQueries.FlatBaseAssign),
      "float side")
    // Forced 1-byte budget: the engine must flip the SAME base-trained
    // cells to the codes-only exchange with the base-fit codebook and
    // SDC gate.
    same(SimQueries.embeddingDedupPayloadAutoIncrOver(all, payloadMax = 1L),
      SimQueries.embeddingDedupPqIncrOver(all, SimQueries.FlatBaseAssign),
      "PQ side")
  }

  test("embeddingDedupFullAutoIncrOver: all FOUR quadrants of the " +
      "composed (strategy x payload) dispatch are exactly their " +
      "registered operators' bodies") {
    val all = vectors
    val big = Long.MaxValue
    def auto(flatMax: Int, payloadMax: Long) =
      SimQueries.embeddingDedupFullAutoIncrOver(all, flatMax = flatMax,
        payloadMax = payloadMax)
    same(auto(2048, big),
      SimQueries.incrementalDedupOver(all, SimQueries.FlatBaseAssign),
      "flat x float (embedding_dedup_incr)")
    // Forced flatMax 2 < |centers|: the strategy axis must flip to the
    // coarse->fine assignment with the shared n^(1/4) sizing.
    same(auto(2, big),
      SimQueries.incrementalDedupOver(all, SimQueries.TwoLevelBaseAssign),
      "two-level x float (embedding_dedup_ivf2_incr)")
    same(auto(2048, 1L),
      SimQueries.embeddingDedupPqIncrOver(all, SimQueries.FlatBaseAssign),
      "flat x PQ (embedding_dedup_pq_incr)")
    same(auto(2, 1L),
      SimQueries.embeddingDedupPqIncrOver(all, SimQueries.TwoLevelBaseAssign),
      "two-level x PQ (embedding_dedup_ivf2_pq_incr)")
  }

  test("the fourth quadrant's registered body differs from its flat " +
      "sibling on assignment, not on pair semantics: every emitted pair " +
      "still verifies at exact cosine >= 0.4") {
    // The quadrant rows must not silently share a branch: the forced
    // two-level PQ body and the forced flat PQ body are DIFFERENT
    // plans (different cell partitions are allowed to emit different
    // pair sets), but both emit only exactly-verified pairs.
    val all = vectors
    val out = SimQueries.embeddingDedupPqIncrOver(all,
      SimQueries.TwoLevelBaseAssign)
    val n = out.count()
    assert(n > 0, "two-level PQ maintenance emitted nothing")
    assert(out.filter($"score_c" < 400000L).count() == 0,
      "pair below the exact-verify threshold escaped the join-back")
  }
}
