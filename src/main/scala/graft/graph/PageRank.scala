package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round PageRank over an edge list, in EXACT integer
  * arithmetic — the graph-quality signal a web-scale training-data
  * pipeline uses to weight crawl sources (Common Crawl publishes
  * harmonic-centrality/PageRank ranks for exactly this purpose).
  *
  * Ranks are BIGINT parts-per-million of the uniform start mass, and
  * every step is integer math (`div` truncating division, both Spark
  * and DuckDB semantics for non-negative operands), so a replay on any
  * engine or partitioning is bit-identical — no double summation whose
  * result depends on reduction order. One round is:
  *
  *   r'(v) = 150000 + (85 * Σ_{u→v} (r(u) div outdeg(u))) div 100
  *
  * i.e. the classic 0.15/0.85 damped update with the division floored
  * per-edge. Dangling mass (nodes with no out-edges) evaporates rather
  * than redistributing — the simplified formulation; callers that need
  * mass conservation symmetrize the edge set (the registered query
  * does).
  *
  * Scale shape: each round is ONE equi-join of the (pinned) edge set
  * against the current rank frame plus one keyed sum — both linear
  * shuffles over |E|, the same budget as a round of
  * [[graft.text.Components]]. Rounds are a fixed small constant (the
  * caller's convergence budget), and the rank frame is |V|-sized — at
  * a 100 TB corpus the edge list shuffles, nothing corpus-sized is
  * ever broadcast or collected. Lineage is cut every round so the
  * plan does not grow with the round count.
  */
object PageRank {

  /** Lineage cut between rounds (the [[graft.text.Components]]
    * convention): reliable checkpoint when a checkpoint dir is
    * configured, localCheckpoint otherwise. */
  private def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** (nid, rank_ppm, outdeg) after `rounds` damped power-iteration
    * rounds from a uniform 1,000,000-ppm start. `edges` must have
    * long-castable `src`/`dst` columns; nodes are the union of both
    * endpoints. Nodes with no out-edges contribute nothing (dangling
    * mass evaporates) and report outdeg 0. */
  def ranksPpm(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 50, s"rounds must be in [1,50], got $rounds")
    // Memory discipline, measured at sf10 (58.7M distinct edges, 117M
    // after the caller's symmetrization): only |V|-sized frames get
    // checkpoint-PINNED (their blocks linger until GC); the two
    // |E|-sized frames are DISK_ONLY persists — read sequentially once
    // per round, never competing with execution heap — and are
    // explicitly UNPERSISTED before return, so repeated runs in one
    // session cannot accumulate edge-frame blocks. (Pinning the edge
    // frames on heap measured 297 s at sf10 with eviction/GC churn,
    // then OOM on back-to-back runs; this is also the reference's own
    // DISK_ONLY discipline for its widest mid-pipeline frames.)
    // Persist PRE-PARTITIONED BY src (guide §2.4 "remove shuffles
    // outright"): deg (groupBy src), withDeg (join on src) and every
    // round's rank join all key on src, so hash-partitioning the edge
    // cache once lets each of them reuse the cached partitioning
    // instead of re-exchanging |E| per consumer (and per round when
    // the rank side is too big to broadcast). The partition COUNT is
    // AQE-coalesced from the data size (repartition by column, no
    // fixed n) — scale-adaptive, not tuned to either local mode or a
    // cluster; locally it also collapses the 64-partition cache scans
    // that dominated the measured per-round job time.
    val es = edges.select(
        col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // |V|-sized, pinned eagerly — the first action, so es materializes
    // here and every later consumer reads the disk cache.
    val deg = pin(es.groupBy("src").agg(count(lit(1)).as("outdeg")))
    // (src, dst, outdeg): the per-edge contribution denominator travels
    // with the edge so each round is one join, not two.
    val withDeg = es.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nodes = pin(es.select(col("src").as("nid"))
      .union(es.select(col("dst").as("nid"))).distinct())
    var ranks = nodes.select(col("nid"), lit(1000000L).as("rank_ppm"))
    for (_ <- 1 to rounds) {
      val in = withDeg.join(ranks, withDeg("src") === ranks("nid"))
        .select(col("dst"), expr("rank_ppm div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_ppm"))
      ranks = pin(nodes.join(in, nodes("nid") === in("dst"), "left")
        .select(nodes("nid"),
          (lit(150000L) + expr("(85 * coalesce(in_ppm, CAST(0 AS BIGINT))) div 100"))
            .as("rank_ppm")))
    }
    // Every round is materialized (pin is eager) and the result below
    // touches only the pinned |V| frames — the edge caches can go now.
    val result = ranks.join(deg.withColumnRenamed("src", "nid"), Seq("nid"), "left")
      .select(col("nid"), col("rank_ppm"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"))
    withDeg.unpersist(blocking = false)
    es.unpersist(blocking = false)
    result
  }
}
