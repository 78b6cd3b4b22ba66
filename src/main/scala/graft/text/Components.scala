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
  * Algorithm: iterative min-label propagation — every vertex starts
  * labelled with itself, and each round takes the min of its own and
  * its neighbours' labels, until no label changes. Deterministic
  * (min is order-independent), and the iteration count is bounded by
  * the component diameter — near-dup clusters are shallow (a handful
  * of hops), so this converges in 2-4 rounds in practice, with
  * `maxIters` as the safety bound.
  *
  * Scale shape: the edge list is checkpointed once and reused; each
  * round is one join + one partial-aggregating min (map-side
  * combine) + one join, all keyed shuffles over the NEAR-DUP SUBSET
  * of the corpus (vertices that appear in a pair), not the corpus.
  * Labels are checkpointed per round so the plan does not grow with
  * iteration count. Docs in no pair are implicitly their own
  * singleton component and never enter the computation.
  */
object Components {

  /** (id, comp) for every vertex appearing in `pairs`; comp is the
    * minimum vertex id reachable through the pair graph.
    *
    * Throws IllegalStateException if labels are still changing when
    * `maxIters` is exhausted: label propagation needs ~diameter rounds,
    * and a >maxIters-diameter component (a pathological chain of
    * near-dups — template spam can produce one) would otherwise return
    * silently WRONG labels, splitting one true component into several
    * and keeping duplicate documents. Loud failure + a bigger
    * `maxIters` is the correct response; near-dup graphs in practice
    * converge in 2-4 rounds. */
  def connected(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20): DataFrame = {
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("nbr_comp")),
          "dst")
        .groupBy(col("src").as("nid"))
        .agg(min(col("nbr_comp")).as("min_nbr"))
      val newComp = least(col("comp"), coalesce(col("min_nbr"), col("comp")))
      // Eager checkpoint: materialized once, then read by BOTH the
      // convergence count and the next round (no recompute, and the
      // lineage resets every iteration).
      val next = labels.join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"), newComp.as("new_comp"),
          (newComp < col("comp")).cast("long").as("chg"))
        .localCheckpoint(true)
      changed = next.agg(coalesce(sum(col("chg")), lit(0L))).head().getLong(0)
      labels = next.select(col("id"), col("new_comp").as("comp"))
      i += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"Components.connected did not converge in $maxIters iterations " +
          s"($changed labels still changing) — component diameter exceeds " +
          "maxIters; raise it (labels would be silently wrong)")
    labels.select(col("id"), col("comp"))
  }
}
