package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns
  * pairwise near-duplicate CANDIDATES (MinHash/SimHash/embedding
  * pairs) into dedup DECISIONS: docs in one component are mutual
  * near-dups, and "keep the min-id doc per component" is the
  * canonical-document policy. Without this, transitive duplicates
  * (A~B, B~C but A!~C) get kept twice.
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14 — the
  * GraphFrames/GraphX-scale formulation):
  *
  *  - large-star: every node connects its LARGER neighbors to its
  *    smallest known node (min of neighborhood and self);
  *  - small-star: every node connects its smaller neighbors and
  *    itself to that minimum.
  *
  * Each pair of phases at least halves the height of every tree in
  * the pointer forest, so the edge set converges to min-rooted stars
  * in O(log n) alternating rounds — vs O(diameter) for plain label
  * propagation, which a pathological near-dup chain (template spam)
  * can push to hundreds of rounds. Deterministic: both phases are
  * min-aggregations, order-independent.
  *
  * Scale shape: each round is two groupBy-min + join passes over the
  * CURRENT edge set, all keyed shuffles over the near-dup SUBSET of
  * the corpus (vertices appearing in a pair), never the corpus. The
  * edge set is checkpointed every round, so the plan does not grow
  * with iteration count and shrinking components shrink the shuffled
  * data round over round. Docs in no pair are implicitly their own
  * singleton component and never enter the computation.
  */
object Components {

  /** Lineage cut between rounds. With a configured checkpoint
    * directory (`sparkContext.setCheckpointDir` — standard on a real
    * cluster) the cut is a RELIABLE checkpoint: round state survives
    * executor loss, which matters when a 100 TB closure runs tens of
    * minutes. Without one (local/dev sessions) it falls back to
    * `localCheckpoint`, whose blocks live on executors — faster, but
    * an executor failure aborts the job instead of recomputing. */
  private def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** (id, comp) for every vertex appearing in `pairs`; comp is the
    * minimum vertex id reachable through the pair graph.
    *
    * Throws IllegalStateException if the edge set is still changing
    * when `maxIters` alternating rounds are exhausted — a silent
    * return would split one true component into several and keep
    * duplicate documents. With O(log n) convergence the cap is
    * unreachable in practice (a 2^20-deep structure converges in
    * ~20 rounds); it exists as the loud backstop. */
  def connected(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20): DataFrame = {
    // ONE materialization of the caller's pair pipeline. `vertices`
    // and `edges` below are both EAGER pins; deriving them straight
    // from `pairs` would execute the caller's full candidate+verify
    // pipeline twice (it is the expensive half of every dedup caller:
    // LSH banding + exact verify, or in-cell cosine scoring). The pair
    // set is the near-dup SUBSET of the corpus — pinning it is
    // |pairs|-sized, the cheapest frame in sight.
    val pr = pin(pairs.select(col(aCol).as("__a"), col(bCol).as("__b")))

    // Every vertex in the pair list (keeps self-pair-only vertices,
    // which the edge set drops as self-loops).
    val vertices = pr.select(col("__a").as("id"))
      .unionByName(pr.select(col("__b").as("id")))
      .distinct()
      .transform(pin)

    // Invariant carried through both phases: edges oriented
    // large -> small (u > v), deduplicated, no self-loops.
    var edges = pr.filter(col("__a") =!= col("__b"))
      .select(greatest(col("__a"), col("__b")).as("u"),
        least(col("__a"), col("__b")).as("v"))
      .distinct()
      .transform(pin)

    // Cheap exact-enough stability check: (count, sum of 64-bit edge
    // hashes). A round that changes nothing produces the identical
    // set; a 64-bit sum collision across DIFFERENT sets is vanishing.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // LARGE-STAR over the symmetrized neighborhood: for each node u
      // with m = min(neighbors ∪ {u}), emit (v, m) for neighbors
      // v > u. Output stays large->small (v > u >= m).
      val sym = edges.unionByName(
        edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = sym.join(lsMin, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()

      // SMALL-STAR over the large->small edges: for each node u with
      // m = min(smaller neighbors), re-attach those neighbors and u
      // itself to m. Output again large->small (x > m for x != m).
      val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ss = ls.join(ssMin, "u")
        .select(col("v").as("x"), col("m"))
        .unionByName(ssMin.select(col("u").as("x"), col("m")))
        .where(col("x") =!= col("m"))
        .select(col("x").as("u"), col("m").as("v"))
        .distinct()
        .transform(pin) // lineage reset; read by signature + next round

      val next = signature(ss)
      converged = next == sig
      sig = next
      edges = ss
      i += 1
    }
    if (!converged && i >= maxIters && sig._1 > 0)
      throw new IllegalStateException(
        s"Components.connected did not converge in $maxIters alternating " +
          "large-star/small-star rounds — raise maxIters (labels would be " +
          "silently wrong)")

    // Converged edges form min-rooted stars: (child, root). Roots and
    // self-loop-only vertices label themselves.
    vertices.join(edges.select(col("u").as("id"), col("v").as("__comp")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("__comp"), col("id")).as("comp"))
  }
}
