package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round semi-supervised label propagation (Zhu & Ghahramani
  * 2002 / Raghavan et al. 2007's LPA, the synchronous clamped-seed
  * variant): seed nodes carry fixed labels, and each round every node
  * adopts the majority label among its labeled neighbors —
  * deterministic argmax (highest vote count, ties to the SMALLEST
  * label), so a replay on any engine or partitioning is bit-identical.
  * The curation use is propagating sparse trusted domain/quality
  * labels through a link graph to label the unlabeled majority of a
  * crawl.
  *
  * All arithmetic is integer (vote counts); there is no damping
  * float. Unlabeled nodes cast no votes; a node with no labeled
  * neighbor keeps its current label (NULL until first reached).
  *
  * Scale shape ([[PageRank]]'s budget): each round is ONE equi-join
  * of the pinned edge list against the |V|-sized label frame, one
  * keyed vote count, and one argmax that the engine's
  * `RankOneToAggregate` rule compiles to a max_by partial aggregate
  * (no per-node sort). Lineage is cut every round, so the plan stays
  * flat across rounds; nothing corpus-sized is collected or
  * broadcast.
  */
object LabelProp {

  private def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** (nid, label, seeded) after `rounds` synchronous clamped rounds.
    * `edges` must have long-castable `src`/`dst` (votes flow src →
    * dst; symmetrize for undirected propagation); `seeds` is
    * (nid, label) with long-castable columns. Nodes are the union of
    * edge endpoints; seed rows for nodes outside the graph are
    * ignored. */
  def propagate(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 50, s"rounds must be in [1,50], got $rounds")
    // Memory discipline (see [[PageRank.ranksPpm]], measured at sf10):
    // the |E|-sized edge frame is a DISK_ONLY persist, unpersisted
    // before return; only |V|-sized frames get checkpoint-pinned.
    // Persist PRE-PARTITIONED BY src (the [[PageRank.ranksPpm]]
    // rationale, guide §2.4): every round's vote join keys on src, so
    // the edge cache carries its partitioning instead of re-exchanging
    // |E| per round; the count is AQE-coalesced from data size.
    val es = edges.select(
        col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nodes = pin(es.select(col("src").as("nid"))
      .union(es.select(col("dst").as("nid"))).distinct())
    // Reduce seeds to ONE row per nid (deterministic min(label)):
    // duplicate (nid, label) seed rows would otherwise multiply the
    // labels frame at the left join below, and the blow-up compounds
    // every round — silently breaking the one-row-per-node invariant.
    val sd = seeds.select(
        col("nid").cast("long").as("nid"), col("label").cast("long").as("slabel"))
      .groupBy(col("nid")).agg(min(col("slabel")).as("slabel"))
    var labels = pin(nodes.join(sd, Seq("nid"), "left")
      .select(col("nid"), col("slabel").as("label"),
        col("slabel").isNotNull.as("seeded")))
    import org.apache.spark.sql.expressions.Window
    for (_ <- 1 to rounds) {
      val votes = es.join(labels, es("src") === labels("nid"))
        .filter(col("label").isNotNull)
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("c").desc, col("label"))
      val top = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dst"), col("label").as("vlabel"))
      labels = pin(labels.join(top, labels("nid") === top("dst"), "left")
        .select(labels("nid"),
          when(col("seeded"), labels("label"))
            .otherwise(coalesce(col("vlabel"), labels("label"))).as("label"),
          col("seeded")))
    }
    // The final labels frame is materialized (pin is eager) — the edge
    // cache can go before the caller ever executes the result.
    es.unpersist(blocking = false)
    labels
  }
}
