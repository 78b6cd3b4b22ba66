package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.{KMeans, Pca, Pq, Similarity}

/** Oracle-checked ANN queries over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
  *
  * Scores are double-precision cosine computed as an explicit ordered
  * left-fold on both sides (see [[graft.sim.Similarity]]) and scaled to
  * integer millionths, so ranks and scores hash-match the DuckDB
  * oracle exactly.
  *
  * Every IVF-shaped query below runs on TRAINED centers
  * ([[KMeans.fitCenters]], deterministic by construction: named init
  * rows, fixed iteration count, exact integer-sum means, id-ascending
  * tie-breaks) with the center count an INDEX PARAMETER — fixed
  * [[TrainedK]] or the classic ~sqrt(n) sizing — never a linear slice
  * of the corpus. That is the 100 TB shape: centers live driver-side
  * (bytes), assignment is a shuffle-free projection, and the corpus
  * shuffles once by cell. The DuckDB oracles replay the ENTIRE
  * pipeline including the k-means step in SQL (a single Lloyd
  * iteration is two argmax assignment passes around one exact
  * integer-sum mean aggregation — all relational), so the trained path
  * is hash-checked end to end, not just rows-checked.
  */
object SimQueries {

  private val K = 3

  /** Fixed centroid count for the fixed-k trained queries — a
    * user-chosen index parameter, independent of corpus size. */
  private val TrainedK = 32

  /** PQ geometry (mirror of [[Pq]]'s defaults — index parameters,
    * corpus-independent). */
  private val PqM = Pq.M
  private val PqSubDim = Pq.SubDim
  private val PqKs = Pq.Ks

  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Classic IVF cell sizing: ~sqrt(n) keeps in-cell population ~sqrt(n)
    * at every scale (a fixed k degenerates to linear in-cell scans as
    * the corpus grows). One count job; the centers themselves are still
    * driver-side bytes. */
  private[graft] def sqrtCells(v: DataFrame): Long =
    math.max(8L, math.sqrt(v.count().toDouble).round)

  /** Run two INDEPENDENT driver-blocking index-construction chains as
    * concurrent Spark jobs (optimization guide §2.6: actions are only
    * sequential because the driver calls them sequentially — a second
    * in-flight chain back-fills executors idled by the first chain's
    * collect barriers and scheduling gaps). Used where k-means center
    * training and PQ codebook training are independent computations
    * over the same corpus: the results are the ones the sequential
    * calls produce, by construction — nothing is shared but the
    * (immutable) input frame. */
  private[graft] def concurrently[A, B](fa: => A, fb: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future(fb)
    val a = fa
    (a, Await.result(fut, Duration.Inf))
  }

  /** [[sqrtCells]] from an already-measured row count (shared stats —
    * no second count job). */
  private[graft] def sqrtCellsOf(n: Long): Long =
    math.max(8L, math.sqrt(n.toDouble).round)

  /** (row count, float payload bytes) of the ×4 AUGMENTED corpus from
    * ONE aggregate over the base embeddings table (guide §1.2: don't
    * compute things twice). [[augmentedVectors]] is a row-preserving
    * 4-way union of length-preserving rotations, so count(aug) =
    * 4·count(base) and every member's width equals its base row's
    * width — the two values are PROVABLY the ones `count()` /
    * [[Similarity.floatPayloadBytes]] measure over the union, while
    * the union formulation scans the base parquet four times per
    * stats consumer (four corpus passes at 100 TB, four scan jobs per
    * query here). */
  private def augmentedStats(spark: SparkSession, dir: String): (Long, Long) = {
    val r = Tables.embeddings(spark, dir)
      .agg(count(lit(1)).as("n"), max(size(col("embedding"))).as("dim"))
      .head()
    val n = 4L * r.getLong(0)
    val dim = if (r.isNullAt(1)) 0L else r.getInt(1).toLong
    (n, n * dim * 4L)
  }

  /** (row count, `id % 10 < 8` base-slice row count, float payload
    * bytes) of the PLAIN registered corpus in ONE base-table
    * aggregate — the same values the per-wrapper `count()` /
    * [[Similarity.floatPayloadBytes]] jobs measured over
    * [[vectors]] (which only renames and round-robin-repartitions the
    * base columns — counts and widths are repartition-invariant),
    * WITHOUT executing the spread exchange a stats job doesn't need:
    * at 100 TB the spread-side count moved the whole corpus through a
    * shuffle to count it. */
  private[graft] def plainStats(spark: SparkSession, dir: String): (Long, Long, Long) = {
    val r = Tables.embeddings(spark, dir).agg(
      count(lit(1)).as("n"),
      count(when(col("vec_id") % 10 < 8, 1)).as("nb"),
      max(size(col("embedding"))).as("dim")).head()
    val dim = if (r.isNullAt(2)) 0L else r.getInt(2).toLong
    (r.getLong(0), r.getLong(1), r.getLong(0) * dim * 4L)
  }

  /** Brute-force exact top-k (the correctness baseline; queries are the
    * vec_id < 8 slice, broadcast against the corpus). */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    Similarity.bruteForceTopK(v.filter(col("id") < 8), v, K)
  }

  /** IVF top-k over trained cells (fixed k = [[TrainedK]], one Lloyd
    * iteration), search restricted to the query's cell. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val centers = KMeans.fitCenters(v, 0L until TrainedK.toLong, iters = 1)
    Similarity.ivfTopKByCenters(v.filter(col("id") < 8), v, centers, K)
  }

  /** Multi-probe IVF over the same trained cells: the query fans out to
    * its 2 nearest cells — the recall knob of a real IVF index (corpus
    * side stays single-assigned, so probes scale only the tiny query
    * side). */
  def annIvfProbe2(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val centers = KMeans.fitCenters(v, 0L until TrainedK.toLong, iters = 1)
    Similarity.ivfTopKByCenters(v.filter(col("id") < 8), v, centers, K,
      nprobe = 2)
  }

  /** In-cell near-duplicate pair scoring shared by the two dedup
    * queries: vectors sharing a nearest-center cell are pairwise scored
    * and kept when cosine >= 0.4 (the corpus has no true duplicates —
    * the operator shape is the point). The explicit repartition by cell
    * BEFORE deriving the two join sides makes their exchange subtrees
    * identical, so the assignment is computed once (ReuseExchange) and
    * the self-join needs no further shuffle. */
  private def dedupPairs(assigned: DataFrame): DataFrame =
    Similarity.selfPairsByBucket(assigned, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.scaledFromParts(Similarity.dot(col("vec_a"), col("vec_b")),
          col("nrm_a"), col("nrm_b")).as("score_c"))
      .filter(col("score_c") >= 400000L)

  /** Embedding-cosine near-duplicate pairs blocked by trained cells
    * (fixed k = [[TrainedK]]): bucketed, never all-pairs. */
  def embeddingDedup(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val centers = KMeans.fitCenters(v, 0L until TrainedK.toLong, iters = 1)
    dedupPairs(Similarity.assignByCenters(v, centers))
  }

  /** Same operator with the ~sqrt(n) cell sizing — the variant whose
    * index parameter tracks corpus scale (in-cell pair work stays
    * O(n^1.5) total instead of O(n^2/k) with fixed k). */
  def embeddingDedupTrained(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val centers = KMeans.fitCenters(v,
      0L until sqrtCellsOf(plainStats(spark, dir)._1), iters = 1)
    dedupPairs(Similarity.assignByCenters(v, centers))
  }

  /** SemDeDup (Abbas et al. 2023) — the composed semantic-dedup
    * PIPELINE, end to end: cluster the embedding space into trained
    * ~sqrt(n) IVF cells, connect within-cell cosine >= 0.4 pairs into
    * semantic clusters ([[graft.text.Components]], O(log n)
    * large-star/small-star rounds), and keep exactly ONE
    * representative per cluster — the minimum id, the library's
    * deterministic canonical convention (the paper keeps the point
    * closest to the centroid; any deterministic rule preserves the
    * prune semantics). Singletons pass through. Output: every vector
    * with its cluster label and keep verdict.
    *
    * Scale shape: the pair stage is cell-bucketed (never all-pairs,
    * O(n^1.5) total with sqrt(n) cells), components run over the dup
    * SUBSET only, and the final verdict join is one |V|-keyed
    * broadcast-or-shuffle equi-join. The DuckDB oracle replays the
    * k-means training relationally and closes the clusters with a
    * recursive CTE — the hash proves cluster labels AND keep set. */
  def semDedup(spark: SparkSession, dir: String): DataFrame =
    semDedupOver(vectors(spark, dir),
      Some(sqrtCellsOf(plainStats(spark, dir)._1)))

  private[graft] def semDedupOver(v: DataFrame,
      cells: Option[Long] = None): DataFrame = {
    val centers = KMeans.fitCenters(v,
      0L until cells.getOrElse(sqrtCells(v)), iters = 1)
    val pairs = dedupPairs(Similarity.assignByCenters(v, centers))
    semDedupTail(v, pairs)
  }

  /** Shared verdict tail: components over the verified pair set, one
    * deterministic keeper (min id) per cluster, singletons pass. */
  private def semDedupTail(v: DataFrame, pairs: DataFrame): DataFrame = {
    val comps = graft.text.Components.connected(pairs, "id_a", "id_b")
    v.select(col("id")).join(comps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("comp"), col("id")).as("cluster"),
        when(col("comp").isNull || col("comp") === col("id"), 1L)
          .otherwise(0L).as("keep"))
  }

  /** INCREMENTAL embedding near-dup — IVF index MAINTENANCE, the
    * embedding member of the incremental family (`minhash_dedup_incr`,
    * `span_dedup_incr`): the index (trained centers + the base
    * corpus's verified pair set) exists BEFORE a delta batch arrives;
    * the delta is assigned by the EXISTING centers (no retraining —
    * the production contract of a deployed IVF index), paired only
    * against same-cell residents (base + delta), and the union of
    * prior pairs and fresh delta-touching pairs is emitted. Because
    * cells partition the corpus under one fixed center set, the
    * composition is IDENTICAL to a full-batch run over all vectors
    * with the base-trained centers — which is exactly what the DuckDB
    * oracle replays, so the hash proves the maintenance path loses and
    * invents nothing. Base/delta split by `vec_id % 10` (the family
    * convention). Scale shape: the delta never touches out-of-cell
    * residents, so a daily delta costs O(|delta| · cell population),
    * not a corpus re-pair. */
  def embeddingDedupIncr(spark: SparkSession, dir: String): DataFrame =
    incrementalDedupOver(vectors(spark, dir),
      flatAssignK(sqrtCellsOf(plainStats(spark, dir)._2)))

  /** The FLAT base-trained assigner builder — the `assignFor` slot of
    * the forced flat rows ([[embeddingDedupIncr]],
    * [[embeddingDedupPqIncr]]): fits ~sqrt(|base|) centers on the base
    * corpus and pins [[Similarity.assignByCenters]] explicitly (a
    * forced row must not depend on the dispatcher's predicate). */
  private[graft] val FlatBaseAssign: DataFrame => (DataFrame => DataFrame) =
    base => flatAssignK(sqrtCells(base))(base)

  /** [[FlatBaseAssign]] with the cell count already measured (shared
    * base-table stats — no count job over the spread frame). */
  private[graft] def flatAssignK(k: Long): DataFrame => (DataFrame => DataFrame) =
    base => {
      val centers = KMeans.fitCenters(base, 0L until k, iters = 1)
      df => Similarity.assignByCenters(df, centers)
    }

  /** The TWO-LEVEL base-trained assigner builder — the `assignFor`
    * slot of the forced coarse→fine rows ([[embeddingDedupIvf2Incr]],
    * [[embeddingDedupIvf2PqIncr]]): same base-trained fine centers,
    * coarse quantizer built over them once (n^(1/4) sizing),
    * [[Similarity.assignByTwoLevel]] pinned explicitly. */
  private[graft] val TwoLevelBaseAssign: DataFrame => (DataFrame => DataFrame) =
    base => twoLevelAssignK(sqrtCells(base))(base)

  /** [[TwoLevelBaseAssign]] with the cell count already measured. */
  private[graft] def twoLevelAssignK(k: Long): DataFrame => (DataFrame => DataFrame) =
    base => {
      val centers = KMeans.fitCenters(base, 0L until k, iters = 1)
      val index = Similarity.buildTwoLevelIndex(centers,
        Similarity.coarseKFor(centers.length))
      df => Similarity.assignByTwoLevel(df, index)
    }

  /** Shared body of the FLOAT-path incremental maintenance family
    * ([[embeddingDedupIncr]] flat, [[embeddingDedupIvf2Incr]]
    * two-level; [[embeddingDedupPqIncr]] is the compressed sibling
    * with its own SDC-gated candidate stage): base/delta split by
    * `id % 10` (the family convention), `assignFor(base)` builds the
    * deployed index FROM THE BASE CORPUS ONLY and returns the rank-1
    * assignment projection — the one thing the variants vary — then
    * prior pairs come from the base residents, fresh pairs from the
    * delta against same-cell residents (base + delta), and the union
    * is emitted. The in-cell fresh join, symmetric-fold scoring
    * (scoring (delta, resident) is bit-equal to the oracle's
    * id-ordered (a, b) because the ascending-index products commute
    * termwise), and the >= 0.4 verify exist once, here. */
  private[graft] def incrementalDedupOver(all: DataFrame,
      assignFor: DataFrame => (DataFrame => DataFrame)): DataFrame = {
    val base = all.filter(col("id") % 10 < 8)
    val delta = all.filter(col("id") % 10 >= 8)
    val assigned = assignFor(base)
    val baseA = assigned(base)
    val deltaA = assigned(delta)
    val prior = dedupPairs(baseA)
    val residents = baseA.unionByName(deltaA)
      .select(col("bucket"), col("id"), col("vec"), col("nrm"))
    val fresh = deltaA
      .select(col("bucket").as("bkd"), col("id").as("did"),
        col("vec").as("dvec"), col("nrm").as("dnrm"))
      .join(residents, col("bkd") === col("bucket") && col("did") =!= col("id"))
      .select(least(col("did"), col("id")).as("id_a"),
        greatest(col("did"), col("id")).as("id_b"),
        Similarity.scaledFromParts(Similarity.dot(col("dvec"), col("vec")),
          col("dnrm"), col("nrm")).as("score_c"))
      .distinct()
      .filter(col("score_c") >= 400000L)
    prior.unionByName(fresh).distinct()
  }

  /** INCREMENTAL PQ index maintenance — the compressed member of the
    * incremental family (`embedding_dedup_incr` is its float sibling):
    * centers AND codebook train on the resident BASE corpus before
    * the delta arrives (the deployed-IVFPQ contract — ingest never
    * retrains), the delta batch is cell-assigned and ENCODED by the
    * existing index, candidate pairs gate on the cheap SDC score at the
    * engine-chosen [[sdcGateFor]] gate, and only survivors join back to the float
    * corpus for the exact cosine >= 0.4 verify. prior ∪ fresh is
    * IDENTICAL to the full-batch run under the base-trained index
    * (cells partition under fixed centers; codes depend only on the
    * fixed codebook), which is exactly what the oracle replays — the
    * hash proves the maintenance path loses and invents nothing.
    * Scale shape: the delta pairs only within its cells, in code
    * space; the float corpus is touched at candidate cardinality. */
  def embeddingDedupPqIncr(spark: SparkSession, dir: String): DataFrame =
    embeddingDedupPqIncrOver(vectors(spark, dir),
      flatAssignK(sqrtCellsOf(plainStats(spark, dir)._2)))

  /** Shared body of the PQ-COMPRESSED incremental maintenance family —
    * the compressed sibling of [[incrementalDedupOver]], with the same
    * `assignFor` slot (the one thing the variants vary): base/delta
    * split by `id % 10`, centers AND codebook train on the base only,
    * both slices are cell-assigned by `assignFor(base)` and ENCODED by
    * the fixed codebook, candidates gate on the cheap SDC score at the
    * engine-chosen [[sdcGateFor]] gate, and only survivors join back
    * to the float corpus for the exact cosine >= 0.4 verify. */
  private[graft] def embeddingDedupPqIncrOver(all: DataFrame,
      assignFor: DataFrame => (DataFrame => DataFrame)): DataFrame = {
    val base = all.filter(col("id") % 10 < 8)
    val delta = all.filter(col("id") % 10 >= 8)
    val (assigner, (cb, gate)) = concurrently(
      assignFor(base),
      { val cb = Pq.fitCodebooks(base); (cb, sdcGateFor(base, cb)) })
    val bc = Pq.broadcastCodebook(all, cb)
    def coded(df: DataFrame): DataFrame =
      assigner(df)
        .withColumn("codes", Pq.encodeCol("vec", bc))
        .withColumn("rnrm", Pq.normCol("codes", bc))
        .select(col("bucket"), col("id"), col("codes"), col("rnrm"))
    val baseC = coded(base)
    val deltaC = coded(delta)
    val prior = graft.etl.Skew.selfPairsByBucket(baseC, Seq("bucket"),
        Seq("id", "codes", "rnrm"), Similarity.CellSplitCap)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.scaledFromParts(Pq.sdcDotCol("codes_a", "codes_b", bc),
          col("rnrm_a"), col("rnrm_b")).as("sdc_c"))
      .filter(col("sdc_c") >= gate)
      .select(col("id_a"), col("id_b"))
    val residents = baseC.unionByName(deltaC)
    val fresh = deltaC
      .select(col("bucket").as("bkd"), col("id").as("did"),
        col("codes").as("dcodes"), col("rnrm").as("drnrm"))
      .join(residents, col("bkd") === col("bucket") && col("did") =!= col("id"))
      .select(least(col("did"), col("id")).as("id_a"),
        greatest(col("did"), col("id")).as("id_b"),
        // The LUT entry is a termwise-commutative fold, so scoring
        // (delta, resident) is bit-equal to the id-ordered (a, b).
        Similarity.scaledFromParts(Pq.sdcDotCol("dcodes", "codes", bc),
          col("drnrm"), col("rnrm")).as("sdc_c"))
      .distinct()
      .filter(col("sdc_c") >= gate)
      .select(col("id_a"), col("id_b"))
    val vn = all.withColumn("nrm", Similarity.norm(col("vec")))
    prior.unionByName(fresh).distinct()
      .join(vn.select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("nrm").as("nrm_a")), Seq("id_a"))
      .join(vn.select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("nrm").as("nrm_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.scaledFromParts(
          Similarity.dot(col("vec_a"), col("vec_b")),
          col("nrm_a"), col("nrm_b")).as("score_c"))
      .filter(col("score_c") >= 400000L)
  }

  /** INCREMENTAL maintenance of the TWO-LEVEL index — the coarse→fine
    * member of the incremental family ([[embeddingDedupIncr]] is the
    * flat sibling, [[embeddingDedupPqIncr]] the compressed one): the
    * fine centers train on the resident BASE corpus and the coarse
    * quantizer is built over them ONCE ([[Similarity.buildTwoLevelIndex]],
    * n^(1/4) sizing) before the delta arrives; the delta batch is then
    * assigned coarse-then-fine by the EXISTING index — no retraining
    * at either level, the deployed-index contract — and pairs only
    * against same-cell residents. prior ∪ fresh is IDENTICAL to the
    * full-batch run under the base-trained index, because rank-1
    * two-level assignment is a deterministic partition of the corpus
    * under a fixed index (every vector lands in exactly one fine
    * cell) — which is exactly what the oracle replays, so the hash
    * proves the maintenance path loses and invents nothing at BOTH
    * assignment levels. Scale shape: the delta pays
    * O((coarseK + |fine|/coarseK)·dim) assignment per row — the
    * two-level constant, not the flat |fine|·dim — then
    * O(|delta| · cell population) pair work. */
  def embeddingDedupIvf2Incr(spark: SparkSession, dir: String): DataFrame =
    incrementalDedupOver(vectors(spark, dir),
      twoLevelAssignK(sqrtCellsOf(plainStats(spark, dir)._2)))

  /** INCREMENTAL maintenance of the TWO-LEVEL × PQ index — the fourth
    * quadrant of the dedup matrix ({flat, coarse→fine} ×
    * {float, codes}), completing it as registered forced rows the way
    * `knn_graph_ivf2pq` completed the graph family's: fine centers,
    * coarse quantizer AND codebook all train on the resident base
    * before the delta arrives; the delta is assigned coarse-then-fine
    * and encoded by the fixed index, candidates gate on SDC, survivors
    * verify exactly. prior ∪ fresh is IDENTICAL to the full-batch run
    * under the base-trained index (two-level rank-1 assignment
    * partitions the corpus under a fixed index; codes depend only on
    * the fixed codebook) — which is exactly what the oracle replays.
    * Scale shape: the two-level assignment constant
    * (O((coarseK + |fine|/coarseK)·dim) per row) AND the codes-only
    * pair exchange, composed — the same pairing `knn_graph_ivf2pq`
    * proved time-neutral at sf10 (BENCH_SF10_IVF2PQ). */
  def embeddingDedupIvf2PqIncr(spark: SparkSession, dir: String): DataFrame =
    embeddingDedupPqIncrOver(vectors(spark, dir),
      twoLevelAssignK(sqrtCellsOf(plainStats(spark, dir)._2)))

  /** The engine-chosen member of the incremental family
    * ([[Similarity.assignerFor]] in the `assignFor` slot — the
    * deployment entry point where no human picks flat vs
    * coarse-quantized assignment per corpus): same base-trained
    * centers, same maintenance contract as [[embeddingDedupIncr]] /
    * [[embeddingDedupIvf2Incr]], with the assignment strategy chosen
    * from |centers| against [[Similarity.FlatCentersMax]] — the
    * dedup-family sibling of `knn_graph_auto`. At every bench SF the
    * sqrt(n) center count sits below the crossover, so the dispatch
    * provably takes the flat branch and the oracle is the flat replay
    * (`embedding_dedup_incr`'s SQL verbatim); the two-level branch
    * keeps its own oracle-checked row (`embedding_dedup_ivf2_incr`),
    * and `SimilaritySpec` differential-tests [[Similarity.assignerFor]]
    * on both sides of the bound. The guard turns the pinned oracle's
    * scale limit into an explicit failure. */
  def embeddingDedupAutoIncr(spark: SparkSession, dir: String): DataFrame =
    incrementalDedupOver(vectors(spark, dir), base => {
      val centers = KMeans.fitCenters(base,
        0L until sqrtCellsOf(plainStats(spark, dir)._2), iters = 1)
      requireFlatBranch("embedding_dedup_auto_incr", centers.length,
        "embedding_dedup_ivf2_incr")
      Similarity.assignerFor(centers)
    })

  /** The pinned-oracle scale guards of the engine-chosen registered
    * rows, factored with the bound as a defaulted parameter so
    * `RegistrySpec` can FORCE each bound and pin the failure mode the
    * guards exist for: past the crossover the dispatcher's behavior is
    * correct engine behavior but a DIFFERENT row set than the pinned
    * cheap-branch oracle, so the row must fail loudly, naming the
    * sibling row whose oracle covers that regime, instead of surfacing
    * as a bare hash mismatch in the driver's compare. Inline `require`s
    * were untested (r15 ADVICE); every dispatcher query routes its
    * guard through these two. */
  private[graft] def requireFlatBranch(query: String, nCenters: Int,
      sibling: String, flatMax: Int = Similarity.FlatCentersMax): Unit =
    require(nCenters <= flatMax,
      s"$query's pinned oracle only covers the flat branch: " +
        s"$nCenters centers > FlatCentersMax=$flatMax; at this scale " +
        s"verify the dispatch via $sibling's own oracle instead")

  /** Float-payload sibling of [[requireFlatBranch]]. */
  private[graft] def requireFloatBranch(query: String, payloadBytes: Long,
      sibling: String,
      payloadMax: Long = Similarity.FloatPayloadBytesMax): Unit =
    require(payloadBytes <= payloadMax,
      s"$query's pinned oracle only covers the float branch: payload " +
        s"$payloadBytes B > FloatPayloadBytesMax=$payloadMax; at this " +
        s"scale verify the dispatch via $sibling's own oracle instead")

  /** The engine-chosen exchange PAYLOAD member of the incremental
    * dedup family — the dedup sibling of `knn_graph_payload_auto`,
    * completing the float↔PQ axis for the second consumer of trained
    * indexes: [[embeddingDedupPqIncr]] is the forced compressed row;
    * here the engine picks float vs codes for the in-cell pair
    * exchange from the measured corpus byte volume
    * ([[Similarity.floatPayloadBytes]], the SAME one-aggregate
    * measurement and [[Similarity.FloatPayloadBytesMax]] crossover as
    * the graph family, so the two families cannot drift). Both
    * branches keep flat base-trained assignment
    * ([[FlatBaseAssign]] — this dispatcher moves ONE axis);
    * each branch IS the corresponding registered operator
    * (`embedding_dedup_incr` / `embedding_dedup_pq_incr`), so both
    * stay independently oracle-checked, and `SimilaritySpec`
    * differential-tests both sides of a forced bound. */
  private[graft] def embeddingDedupPayloadAutoIncrOver(all: DataFrame,
      payloadMax: Long = Similarity.FloatPayloadBytesMax,
      payloadBytes: Option[Long] = None,
      assignFor: DataFrame => (DataFrame => DataFrame) = FlatBaseAssign): DataFrame =
    if (payloadBytes.getOrElse(Similarity.floatPayloadBytes(all)) <= payloadMax)
      incrementalDedupOver(all, assignFor)
    else embeddingDedupPqIncrOver(all, assignFor)

  /** [[embeddingDedupPayloadAutoIncrOver]] as a REGISTERED row: at
    * every bench SF the float payload sits orders of magnitude under
    * the 2 GiB crossover, so the dispatch provably takes the float
    * branch and the oracle is the flat replay
    * (`embedding_dedup_incr`'s SQL verbatim); the guard turns the
    * pinned oracle's scale limit into an explicit failure. The
    * measured payload threads through so the rule's corpus aggregate
    * is paid once. */
  def embeddingDedupPayloadAutoIncr(spark: SparkSession,
      dir: String): DataFrame = {
    val all = vectors(spark, dir)
    // ONE base-table aggregate serves the payload predicate AND the
    // assigner's cell sizing (plainStats doc — was two jobs, each
    // executing the spread exchange).
    val (_, nBase, payload) = plainStats(spark, dir)
    requireFloatBranch("embedding_dedup_payload_auto_incr", payload,
      "embedding_dedup_pq_incr")
    embeddingDedupPayloadAutoIncrOver(all, payloadBytes = Some(payload),
      assignFor = flatAssignK(sqrtCellsOf(nBase)))
  }

  /** The DEPLOYMENT entry point of the incremental dedup family — the
    * dedup sibling of `knn_graph_full_auto`, closing the dispatch
    * matrix for the second consumer of trained indexes: BOTH engine
    * choices composed, assignment strategy from |centers|
    * ([[Similarity.assignerFor]], the shared
    * [[Similarity.FlatCentersMax]] rule) × exchange payload from
    * corpus bytes ([[Similarity.floatPayloadBytes]] against the shared
    * [[Similarity.FloatPayloadBytesMax]] rule), landing on one of the
    * FOUR registered quadrant rows: `embedding_dedup_incr` (flat ×
    * float), `embedding_dedup_ivf2_incr` (two-level × float),
    * `embedding_dedup_pq_incr` (flat × codes), and
    * `embedding_dedup_ivf2_pq_incr` (two-level × codes). Each
    * predicate is the SAME one its single-axis dispatcher uses, so
    * the composed choice cannot disagree with the parts; all four
    * quadrants differential-tested under forced bounds. `onCenters`
    * lets the registered row attach its pinned-oracle guard at the
    * moment the strategy predicate's input exists. */
  private[graft] def embeddingDedupFullAutoIncrOver(all: DataFrame,
      flatMax: Int = Similarity.FlatCentersMax,
      payloadMax: Long = Similarity.FloatPayloadBytesMax,
      payloadBytes: Option[Long] = None,
      onCenters: Array[(Long, Array[Float])] => Unit = _ => (),
      baseCells: Option[Long] = None): DataFrame = {
    val assignFor: DataFrame => (DataFrame => DataFrame) = base => {
      val centers = KMeans.fitCenters(base,
        0L until baseCells.getOrElse(sqrtCells(base)), iters = 1)
      onCenters(centers)
      Similarity.assignerFor(centers, flatMax)
    }
    if (payloadBytes.getOrElse(Similarity.floatPayloadBytes(all)) <= payloadMax)
      incrementalDedupOver(all, assignFor)
    else embeddingDedupPqIncrOver(all, assignFor)
  }

  /** [[embeddingDedupFullAutoIncrOver]] as a REGISTERED row: at every
    * bench SF both predicates pick the cheap-and-exact quadrant
    * (sqrt(0.8n) centers < 2048, payload ≪ 2 GiB), so the oracle is
    * the flat-float replay (`embedding_dedup_incr`'s SQL verbatim);
    * each other quadrant keeps its own oracle-checked row and the
    * guards make the pinned oracle's scale limits explicit failures
    * instead of hash mismatches. */
  def embeddingDedupFullAutoIncr(spark: SparkSession,
      dir: String): DataFrame = {
    val all = vectors(spark, dir)
    // ONE base-table aggregate serves the payload predicate AND the
    // assigner's cell sizing (plainStats doc).
    val (_, nBase, payload) = plainStats(spark, dir)
    requireFloatBranch("embedding_dedup_full_auto_incr", payload,
      "embedding_dedup_pq_incr (flat) / embedding_dedup_ivf2_pq_incr " +
        "(two-level)")
    embeddingDedupFullAutoIncrOver(all, payloadBytes = Some(payload),
      onCenters = cs => requireFlatBranch("embedding_dedup_full_auto_incr",
        cs.length, "embedding_dedup_ivf2_incr"),
      baseCells = Some(sqrtCellsOf(nBase)))
  }

  /** SRP-LSH banding parameters: [[SrpBands]] independent hash tables
    * of [[SrpPlanes]] sign bits each. More planes -> smaller buckets
    * (precision); more bands -> more chances to collide (recall). */
  private val SrpBands = 2
  private val SrpPlanes = 6

  /** Embedding near-dup pairs via signed-random-projection LSH
    * ([[Similarity.srpNearDuplicates]]) — the TRAINING-FREE alternative
    * to the IVF-cell blocking of [[embeddingDedup]]: IVF needs a
    * k-means pass but probes one cell; SRP needs zero passes but pays
    * x[[SrpBands]] exchange volume — that trade is exactly why both
    * variants exist. Same cosine >= 0.4 verify contract as the IVF
    * variants (the banding math targets the high-similarity regime;
    * see the operator doc — `SimilaritySpec` proves the planted-pair
    * recall there). */
  def embeddingDedupSrp(spark: SparkSession, dir: String): DataFrame =
    Similarity.srpNearDuplicates(vectors(spark, dir), dim = 64,
      bands = SrpBands, planes = SrpPlanes, minScoreC = 400000L)

  /** SRP-bucketed top-k search over the same query slice as
    * [[annTopK]]/[[annIvf]] — the training-free member of the search
    * family (brute = exact baseline, IVF = trained cells, SRP = zero
    * training passes). 4 bands widen recall at the cost of x4 exchange
    * volume on the (broadcast-sized) candidate join. */
  def annSrp(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    Similarity.srpTopK(v.filter(col("id") < 8), v, dim = 64,
      bands = 4, planes = SrpPlanes, k = K)
  }

  /** Augmented kNN corpus (×4): every embedding plus its rotations by
    * 16, 32 and 48 positions (`concat(vec[17..64], vec[1..16])` etc. —
    * norm-preserving, genuinely different directions, pure builtins so
    * DuckDB replays them exactly). The kNN-graph pair runs on this: at
    * the raw sf0.1 row count the brute pass's whole O(n²) fits in one
    * cheap job and per-job overhead hides the IVF asymptotics;
    * quadrupling n grows the brute pair count 16× while the IVF side
    * only quadruples, which is exactly the scaling story the pair
    * exists to demonstrate. */
  private[graft] def augmentedVectors(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id0"), col("embedding").as("vec"))
    (0 until 4).map { r =>
      val rot = 16 * r
      val vec = if (r == 0) col("vec")
        else concat(slice(col("vec"), rot + 1, 64 - rot),
          slice(col("vec"), 1, rot))
      v.select((col("id0") * 4 + r).as("id"), vec.as("vec"))
    }.reduce(_ unionByName _)
  }

  /** kNN-graph construction, brute force: EVERY vector queries for its
    * K nearest neighbours (the workload behind embedding dedup /
    * diversity sampling). O(n²) pair scores — exact, and the honest
    * baseline the IVF variant below has to beat — but evaluated by the
    * native top-k expression over a driver-collected candidate matrix
    * ([[Similarity.knnGraphExact]]): the join+window formulation
    * materialized all 64M pair ROWS through a nested-loop join and
    * window-sorted them to keep 3 per query (~9 s at sf0.1); the
    * expression runs the same 64M dot products inside one projection
    * and emits only survivors. Differentially tested bit-equal to
    * `bruteForceTopK(v, v, K)`. Spread: the scoring runs before any
    * exchange and would otherwise sit on one core. */
  def knnGraphBrute(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.spread(augmentedVectors(spark, dir))
    Similarity.knnGraphExact(v, K)
  }

  /** kNN-graph via trained IVF: Lloyd-refined centroids with the
    * classic IVF sizing k ≈ √n, then per-cell search with 2 probes.
    * O(n·k) assignment + O(n²·nprobe/k) in-cell scoring beats the
    * O(n²) brute pass for n >> k, and is the 100 TB shape: centers
    * live driver-side (bytes), assignment is a shuffle-free
    * projection, the corpus shuffles ONCE by cell. The k-means index
    * build is included in the measured cost (bench timings start
    * before the builder runs), so the bench win over
    * `knn_graph_brute` is end-to-end, not amortized away.
    *
    * No Tables.spread: the heavy in-cell scoring happens AFTER the
    * bucket exchange (already parallel), so spreading would only add
    * a shuffle to every k-means scan of this small-file input. */
  def knnGraphIvf(spark: SparkSession, dir: String): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val centers = KMeans.fitCenters(v,
      0L until sqrtCellsOf(augmentedStats(spark, dir)._1), iters = 1)
    Similarity.knnGraphTopK(v, centers, K, nprobe = 2)
  }

  /** TWO-LEVEL IVF kNN graph — the same trained sqrt(n) fine centers
    * as [[knnGraphIvf]], but assignment goes coarse-then-fine
    * ([[Similarity.knnGraphTopKTwoLevel]]): the coarse quantizer is
    * the n^(1/4)-sized lowest-id slice of the fine centers, fine
    * centers group under their nearest coarse center, and a vector
    * ranks O(n^(1/4) + n^(1/4)) centers per row instead of O(sqrt n).
    * This removes the last corpus-dependent per-row constant in the
    * IVF family — at 1e5 fine centers the flat path does 1e5 dots per
    * row, this does ~632 — while the index ships as ONE broadcast
    * stub (never a plan literal; PlanAuditSpec asserts it). The
    * oracle replays coarse selection, fine grouping, and both ranking
    * levels relationally, so the approximation RULE is hash-checked,
    * not just the output shape. */
  def knnGraphIvf2(spark: SparkSession, dir: String): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val centers = KMeans.fitCenters(v,
      0L until sqrtCellsOf(augmentedStats(spark, dir)._1), iters = 1)
    Similarity.knnGraphTopKTwoLevel(v, centers,
      Similarity.coarseKFor(centers.length), K, nprobe = 2)
  }

  /** The FULL composed index — two-level assignment x PQ payload
    * ([[Similarity.knnGraphTopKTwoLevelPq]]): the FAISS
    * IVFPQ-with-coarse-quantizer shape a real 10⁵-center deployment
    * runs. Same trained sqrt(n) fine centers, n^(1/4) coarse sizing
    * and probes as [[knnGraphIvf2]]; same codebook and codes-only
    * bucket exchange as [[knnGraphIvfPq]] — so this row diffs
    * directly against BOTH parents: assignment rule vs ivfpq,
    * payload vs ivf2. The oracle composes the two proven replays
    * (two-level assignment CTEs + PQ codebook CTEs + SDC tail). */
  def knnGraphIvf2Pq(spark: SparkSession, dir: String): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val (centers, cb) = concurrently(
      KMeans.fitCenters(v,
        0L until sqrtCellsOf(augmentedStats(spark, dir)._1), iters = 1),
      Pq.fitCodebooks(v))
    Similarity.knnGraphTopKTwoLevelPq(v, centers,
      Similarity.coarseKFor(centers.length), cb, K,
      nprobe = 2)
  }

  /** The engine-chosen flat↔two-level dispatch as a REGISTERED row
    * ([[Similarity.knnGraphTopKAuto]]): same trained sqrt(n) fine
    * centers, K and probes as [[knnGraphIvf]]/[[knnGraphIvf2]], with
    * the assignment strategy picked by the engine from |centers|
    * alone against the measured [[Similarity.FlatCentersMax]]
    * crossover — the deployment entry point, where no human chooses
    * flat vs coarse-quantized per corpus. At every bench SF the
    * sqrt(n) center count sits below the crossover, so the dispatcher
    * deterministically takes the EXACT flat branch and the oracle is
    * the flat replay (the `knn_graph_ivf` SQL verbatim); the
    * two-level branch keeps its own oracle-checked row
    * (`knn_graph_ivf2`) and `SimilaritySpec` differential-tests the
    * dispatch on BOTH sides of the bound, so each branch stays
    * independently proven while this row proves the dispatch call
    * itself. */
  def knnGraphAuto(spark: SparkSession, dir: String): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val centers = KMeans.fitCenters(v,
      0L until sqrtCellsOf(augmentedStats(spark, dir)._1), iters = 1)
    // The registered oracle is hard-pinned to the flat replay, which is
    // only the branch the dispatcher takes while sqrt(4n) centers stay
    // within FlatCentersMax (~1M base vectors). Past that the two-level
    // branch is correct engine behavior but a DIFFERENT row set than
    // this oracle — fail loudly here instead of surfacing as a hash
    // mismatch in the driver's compare.
    requireFlatBranch("knn_graph_auto", centers.length, "knn_graph_ivf2")
    Similarity.knnGraphTopKAuto(v, centers, K, nprobe = 2)
  }

  /** The engine-chosen float↔PQ PAYLOAD dispatch as a REGISTERED row
    * ([[Similarity.knnGraphTopKPayloadAuto]]) — the byte-budget level
    * of the engine-chosen family (`knn_graph_auto` picks the
    * assignment strategy from |centers|; this picks what the bucket
    * exchange carries from dim x corpus bytes). At every bench SF the
    * float payload sits orders of magnitude under the 2 GiB
    * [[Similarity.FloatPayloadBytesMax]] crossover, so the dispatcher
    * deterministically takes the EXACT float branch and the oracle is
    * the flat replay; the compressed branch keeps its own
    * oracle-checked row (`knn_graph_ivfpq`) and `SimilaritySpec`
    * differential-tests the dispatch on BOTH sides of a forced bound,
    * so each branch stays independently proven while this row proves
    * the dispatch call itself. The guard below turns the scale limit
    * of the PINNED ORACLE into an explicit failure instead of a hash
    * mismatch (the knn_graph_auto pattern). */
  def knnGraphPayloadAuto(spark: SparkSession, dir: String): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val (n, payload) = augmentedStats(spark, dir)
    val centers = KMeans.fitCenters(v, 0L until sqrtCellsOf(n), iters = 1)
    requireFloatBranch("knn_graph_payload_auto", payload, "knn_graph_ivfpq")
    Similarity.knnGraphTopKPayloadAuto(v, centers, K, nprobe = 2,
      payloadBytes = Some(payload))
  }

  /** The DEPLOYMENT entry point as a REGISTERED row
    * ([[Similarity.knnGraphTopKFullAuto]]): both engine choices
    * composed — assignment strategy from |centers|, exchange payload
    * from corpus bytes — landing on one of the four registered
    * quadrant operators. At every bench SF both predicates pick the
    * cheap-and-exact side (sqrt(4n) centers < 2048, payload ≪ 2 GiB),
    * so the row's oracle is the flat-float replay; each other quadrant
    * keeps its own oracle-checked row (`knn_graph_ivf2`,
    * `knn_graph_ivfpq`, `knn_graph_ivf2pq`) and `SimilaritySpec`
    * differential-tests all FOUR quadrants against their operators
    * under forced bounds. The guards make the pinned oracle's scale
    * limits explicit failures instead of hash mismatches. */
  def knnGraphFullAuto(spark: SparkSession, dir: String): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val (n, payload) = augmentedStats(spark, dir)
    val centers = KMeans.fitCenters(v, 0L until sqrtCellsOf(n), iters = 1)
    requireFlatBranch("knn_graph_full_auto", centers.length,
      "knn_graph_ivf2 (float) / knn_graph_ivf2pq (codes)")
    requireFloatBranch("knn_graph_full_auto", payload,
      "knn_graph_ivfpq (flat) / knn_graph_ivf2pq (two-level)")
    Similarity.knnGraphTopKFullAuto(v, centers, K, nprobe = 2,
      payloadBytes = Some(payload))
  }

  /** Probe-count sibling of [[requireFlatBranch]]: the pinned oracle
    * replays one fixed probe count, so an engine choice that moves off
    * it must fail naming the replay to re-pin, not hash-mismatch. */
  private[graft] def requireProbePinned(query: String, chosen: Int,
      pinned: Int, sibling: String): Unit =
    require(chosen == pinned,
      s"$query's pinned oracle replays nprobe=$pinned, but the measured " +
        s"occupancy histogram chose nprobe=$chosen; at this occupancy " +
        s"verify via $sibling")

  /** The engine-chosen PROBE COUNT as a REGISTERED row
    * ([[Similarity.probeFor]]) — the RECALL knob of the IVF family
    * freed, completing the engine-chosen set (strategy from |centers|,
    * payload from corpus bytes, probes from the occupancy histogram):
    * same trained sqrt(n) cells as [[knnGraphIvf]], with `nprobe`
    * picked by the smallest-probe-count-that-delivers-the-target-
    * candidate-volume rule over the measured cell histogram
    * ([[Similarity.nprobeFor]]; target = the recall-gated two-mean-
    * cells volume of [[Similarity.targetCandidatesFor]]). At every
    * bench SF the trained histogram is near-uniform (weighted mean
    * cell < 2x unweighted), so the rule provably lands on the proven
    * nprobe = 2 setting and the oracle is the flat nprobe=2 replay
    * (`knn_graph_ivf`'s SQL verbatim); the guard turns an off-pin
    * choice into an explicit failure, and `SimilaritySpec` pins the
    * rule's three regimes (uniform / hub / fragmented) plus the
    * forced-target differential on both sides. */
  def knnGraphProbeAuto(spark: SparkSession, dir: String): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val centers = KMeans.fitCenters(v,
      0L until sqrtCellsOf(augmentedStats(spark, dir)._1), iters = 1)
    val p = Similarity.probeFor(v, centers)
    requireProbePinned("knn_graph_probe_auto", p, 2,
      "a re-pin of the oracle to trainedAssignSql(nprobe=chosen) — " +
        "knn_graph_ivf is the nprobe=2 replay")
    Similarity.knnGraphTopK(v, centers, K, nprobe = p)
  }

  /** Training-free kNN graph over the same ×4 corpus — the SRP member
    * of the graph family (exact baseline / trained IVF / zero-training
    * SRP), same 4-band tables as [[annSrp]]. */
  def knnGraphSrp(spark: SparkSession, dir: String): DataFrame =
    knnGraphSrpOp(spark, dir, onePass = true)

  /** [[knnGraphSrp]] with the physical-form knob exposed — the
    * [[graft.tools.AbSrp]] A/B entry point (`onePass` is a threaded
    * parameter, not a global; the registered query pins the
    * production form). */
  private[graft] def knnGraphSrpOp(spark: SparkSession, dir: String,
      onePass: Boolean): DataFrame =
    Similarity.srpKnnGraph(augmentedVectors(spark, dir), dim = 64,
      bands = 4, planes = SrpPlanes, k = K, onePass = onePass)

  /** The measured scale lever for SRP banding (SCALE.md): bucket count
    * must track corpus size — occupancy n/2^planes is what the
    * bucket-local pair count is quadratic IN, so planes grows with
    * log2(n) to pin occupancy. [[SrpPlanes]]=6 (64 buckets/band) is
    * sized for the sf0.01/sf0.1 corpus; this 10-plane variant
    * (1024 buckets/band) is the sf1-appropriate setting — the sf1
    * soak measures the same corpus/operator at both settings
    * (BENCH_SF1*.json). Correctness is scale-independent: the oracle
    * replays the 10-plane construction exactly. */
  private val SrpPlanesScaled = 10

  def knnGraphSrpScaled(spark: SparkSession, dir: String): DataFrame =
    knnGraphSrpScaledOp(spark, dir, onePass = true)

  private[graft] def knnGraphSrpScaledOp(spark: SparkSession, dir: String,
      onePass: Boolean): DataFrame =
    Similarity.srpKnnGraph(augmentedVectors(spark, dir), dim = 64,
      bands = 4, planes = SrpPlanesScaled, k = K, onePass = onePass)

  /** The banding constant chosen BY THE ENGINE
    * ([[Similarity.planesFor]]): one count of the corpus sizes the
    * band tables so occupancy stays pinned as data grows — at sf0.01
    * the rule picks the floor (4 planes), at sf1 it lands exactly on
    * the soak-proven 10-plane setting, and at sf10 it keeps scaling
    * without a human re-deriving the constant. The count is the same
    * stats lookup a warehouse makes before choosing a plan — one
    * columnar-count job, not a collect. The oracle replays the
    * integer rule from count(*) and the construction from the chosen
    * width, so a green hash proves the engine's choice, not a pinned
    * constant. */
  def knnGraphSrpAuto(spark: SparkSession, dir: String): DataFrame =
    knnGraphSrpAutoOp(spark, dir, onePass = true)

  private[graft] def knnGraphSrpAutoOp(spark: SparkSession, dir: String,
      onePass: Boolean): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val planes = Similarity.planesFor(augmentedStats(spark, dir)._1)
    Similarity.srpKnnGraph(v, dim = 64, bands = 4, planes = planes, k = K,
      onePass = onePass)
  }

  /** Per-vector PQ reconstruction quality ([[Pq.reconScores]]): pins
    * the whole train/encode/decode chain — per-subspace Lloyd
    * training from named init rows, argmin encoding, LUT norms — to
    * the oracle row by row. The VALUE also documents the honest
    * price of 32x compression on this corpus (scaled cosine of
    * vector vs reconstruction; 1e6 would be lossless). */
  def pqReconError(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    Pq.reconScores(v, Pq.fitCodebooks(v))
  }

  /** ADC search ([[Pq.adcTopK]]): float queries against the
    * PQ-compressed corpus — compression's effect on RANKING,
    * oracle-visible in isolation (same query slice and K as
    * [[annTopK]], so the two rows diff directly). */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    Pq.adcTopK(v.filter(col("id") < 8), v, Pq.fitCodebooks(v), K)
  }

  /** IVFADC search ([[Similarity.ivfTopKByCentersPq]]): trained-cell
    * blocking + asymmetric ADC scoring — float queries against the
    * coded corpus, the production search mode of an IVFPQ index.
    * Same query slice, K, and fixed-k cells as [[annIvf]], so the
    * three rows (exact [[annTopK]] / IVF [[annIvf]] / IVFADC) diff
    * the blocking loss and the compression loss separately. */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val (centers, cb) = concurrently(
      KMeans.fitCenters(v, 0L until TrainedK.toLong, iters = 1),
      Pq.fitCodebooks(v))
    Similarity.ivfTopKByCentersPq(v.filter(col("id") < 8), v, centers,
      cb, K, nprobe = 2)
  }

  /** Two-stage compressed search ([[Similarity.rerankExact]] over an
    * IVFADC shortlist): ADC retrieves 4K candidates in code space,
    * the float re-rank keeps the true top-K — the deployment-mode
    * answer to quantization collapsing near-ties (cluster members
    * that code identically re-separate under the exact cosine). The
    * float corpus is touched for |q| x 4K rows only. */
  def annPqRerank(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val q = v.filter(col("id") < 8)
    val (centers, cb) = concurrently(
      KMeans.fitCenters(v, 0L until TrainedK.toLong, iters = 1),
      Pq.fitCodebooks(v))
    val shortlist = Similarity.ivfTopKByCentersPq(q, v, centers,
      cb, K * 4, nprobe = 2)
    Similarity.rerankExact(shortlist, q, v, K)
  }

  /** Brute binary-quantization top-k ([[graft.sim.BitQ.bqTopK]]):
    * float queries against the 1-bit-per-dim coded corpus, scored by
    * the RaBitQ unbiased cosine estimate (rotation + sign code +
    * per-vector correction — no training pass, no codebook). Same
    * query slice and K as [[annTopK]]/[[annPq]], so the three rows
    * diff exact vs 8-byte-PQ vs 1-word-BQ ranking directly. */
  def annBq(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    graft.sim.BitQ.bqTopK(v.filter(col("id") < 8), v, K)
  }

  /** Two-stage BQ search ([[graft.sim.BitQ.ivfTopKByCentersBq]] +
    * [[Similarity.rerankExact]]): trained-cell blocking (same fixed-k
    * cells and probes as [[annIvfPq]]), a 4K shortlist in code space
    * — the bucket exchange carrying 24 bytes/vector — and the exact
    * float re-rank over survivors. The production deployment mode of
    * the training-free binary index. */
  def annBqRerank(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val q = v.filter(col("id") < 8)
    val centers = KMeans.fitCenters(v, 0L until TrainedK.toLong, iters = 1)
    val shortlist = graft.sim.BitQ.ivfTopKByCentersBq(q, v, centers,
      K * 4, nprobe = 2)
    Similarity.rerankExact(shortlist, q, v, K)
  }

  /** IVFPQ kNN graph ([[Similarity.knnGraphTopKPq]]): the same
    * trained sqrt(n) cells and probes as [[knnGraphIvf]], but the
    * bucket exchange carries PQ codes instead of float vectors and
    * in-cell pairs score via the broadcast LUT — the compressed-index
    * member of the graph family (exact / trained IVF / two-level /
    * SRP / IVFPQ). */
  def knnGraphIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val (centers, cb) = concurrently(
      KMeans.fitCenters(v,
        0L until sqrtCellsOf(augmentedStats(spark, dir)._1), iters = 1),
      Pq.fitCodebooks(v))
    Similarity.knnGraphTopKPq(v, centers, cb, K, nprobe = 2)
  }

  /** ENGINE-CHOSEN SDC prefilter gate (the [[Similarity.planesFor]]
    * pattern — no hand-pinned constant): the 400000 verify threshold
    * deflated by the measured mean reconstruction cosine of the
    * TRAINING corpus, squared (both pair sides quantize, so a true
    * pair's code-space score deflates ~recon² in expectation). A
    * high-fidelity codebook keeps the gate tight (few wasted exact
    * verifies); a lossy one opens it so true pairs are not lost to
    * compression — the fixed 0.3 gate this replaces kept only 3 of
    * the float path's 15 pairs on the recon≈0.63 i.i.d. corpus. An
    * index recall parameter, not a correctness one: the oracle
    * replays the SAME measurement (exact integer score sum, IEEE
    * double mean/square, floor), so the row stays hash-exact. One
    * extra aggregate pass at construction (the declared eager
    * envelope of the trained-index queries). */
  private[graft] def sdcGateFor(train: DataFrame,
      cb: graft.expressions.PqCodebook): Long = {
    val r = Pq.reconScores(train, cb)
      .agg(sum(col("score_c")).as("s"), count(lit(1)).as("n")).head()
    val m = r.getLong(0).toDouble / r.getLong(1).toDouble / 1e6
    math.floor(400000d * m * m).toLong
  }

  /** SemDeDup with a PQ-compressed pair stage — the 100 TB form of
    * [[semDedup]]: the in-cell pair exchange carries (id, codes,
    * rnrm) — m small ints and a double per vector instead of dim
    * floats (~6x narrower at m=8/dim=64) — candidates are gated by
    * the cheap SDC lookup score at the engine-chosen [[sdcGateFor]]
    * gate, and only the SURVIVORS join back to the float corpus for the exact cosine >=
    * 0.4 verify. Components and the keep rule then run over verified
    * pairs exactly as in [[semDedup]].
    *
    * Scale shape: pair work dominates SemDeDup's cost (O(n^1.5) with
    * sqrt(n) cells) and every candidate costs m LUT lookups instead
    * of dim multiply-adds; the exact verify touches only the
    * candidate set, so the wide float rows never enter the quadratic
    * stage. The join-back is id-keyed — cardinality |candidates|,
    * not |pairs|. */
  def semDedupPq(spark: SparkSession, dir: String): DataFrame =
    semDedupPqOver(vectors(spark, dir),
      Some(sqrtCellsOf(plainStats(spark, dir)._1)))

  /** The code-space candidate stage of [[semDedupPqOver]], exposed so
    * the plan audit can pin its exchange width (the registered query
    * checkpoints components, which cuts this stage out of the final
    * plan). */
  private[graft] def semDedupPqCandidates(v: DataFrame,
      cells: Option[Long] = None): DataFrame = {
    val (centers, (cb, gate)) = concurrently(
      KMeans.fitCenters(v, 0L until cells.getOrElse(sqrtCells(v)), iters = 1),
      { val cb = Pq.fitCodebooks(v); (cb, sdcGateFor(v, cb)) })
    val bc = Pq.broadcastCodebook(v, cb)
    val coded = Similarity.assignByCenters(v, centers)
      .withColumn("codes", Pq.encodeCol("vec", bc))
      .withColumn("rnrm", Pq.normCol("codes", bc))
      .select(col("bucket"), col("id"), col("codes"), col("rnrm"))
    graft.etl.Skew.selfPairsByBucket(coded, Seq("bucket"),
        Seq("id", "codes", "rnrm"), Similarity.CellSplitCap)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.scaledFromParts(Pq.sdcDotCol("codes_a", "codes_b", bc),
          col("rnrm_a"), col("rnrm_b")).as("sdc_c"))
      .filter(col("sdc_c") >= gate)
      .select(col("id_a"), col("id_b"))
  }

  private[graft] def semDedupPqOver(v: DataFrame,
      cells: Option[Long] = None): DataFrame = {
    val cand = semDedupPqCandidates(v, cells)
    val vn = v.withColumn("nrm", Similarity.norm(col("vec")))
    val pairs = cand
      .join(vn.select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("nrm").as("nrm_a")), Seq("id_a"))
      .join(vn.select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("nrm").as("nrm_b")), Seq("id_b"))
      .filter(Similarity.scaledFromParts(
        Similarity.dot(col("vec_a"), col("vec_b")),
        col("nrm_a"), col("nrm_b")) >= 400000L)
      .select(col("id_a"), col("id_b"))
    semDedupTail(v, pairs)
  }

  /** Two-stage compressed kNN GRAPH ([[Similarity.rerankExactGraph]]
    * over the IVFPQ shortlist): every vector's 4K code-space
    * candidates re-score exactly and re-rank to top-K. The graph
    * sibling of [[annPqRerank]] — same quantization-collapse cure,
    * but the query side is the corpus, so the float fetches are
    * id-keyed equi-joins (|V|·4K rows, linear in the corpus), never
    * a broadcast of a corpus-sized shortlist. */
  def knnGraphIvfPqRerank(spark: SparkSession, dir: String): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val (centers, cb) = concurrently(
      KMeans.fitCenters(v,
        0L until sqrtCellsOf(augmentedStats(spark, dir)._1), iters = 1),
      Pq.fitCodebooks(v))
    val shortlist = Similarity.knnGraphTopKPq(v, centers,
      cb, K * 4, nprobe = 2)
    Similarity.rerankExactGraph(shortlist, v, K)
  }

  /** Deterministic CLUSTERED corpus for the registered recall row:
    * 40 base embeddings (vec_id < 40) each expanded to a 5-member
    * cluster — member j perturbs every coordinate by ±0.02·j with the
    * sign drawn from the portable md5 construction (the [[Similarity.srpSign]]
    * trick), so members share a direction (cosine ≈ 0.99+) while the
    * 40 clusters stay far apart. Pure builtins in DOUBLE with a final
    * FLOAT cast, so DuckDB regenerates the corpus bit-for-bit. Ids are
    * dense (base·5 + j), which makes `0 until 16` valid k-means init
    * rows at every SF. */
  private[graft] def clusteredCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 40)
      .select(col("vec_id").as("bid"), col("embedding").as("bvec"))
    base
      .withColumn("j", explode(sequence(lit(0), lit(4))))
      .select((col("bid") * 5 + col("j")).as("id"),
        transform(col("bvec"), (x, i) => {
          val sign = when(
            conv(substring(md5(concat_ws(":", lit("cl"),
              col("bid").cast("string"), col("j").cast("string"),
              i.cast("string"))), 1, 15), 16, 10).cast("long") % 2 === 0,
            lit(1.0d)).otherwise(lit(-1.0d))
          (x.cast("double") + lit(0.02d) * col("j").cast("double") * sign)
            .cast("float")
        }).as("vec"))
  }

  /** ANN recall ON CLUSTERED DATA as a registered, hash-checked
    * query (round-11 verdict task 5): the RecallSpec >= 0.8 gate ran
    * in ScalaTest only — this row makes the measured number itself
    * part of the correctness contract. Truth = exact brute-force
    * top-K over the clustered corpus; approx = the trained-IVF kNN
    * graph (16 init cells, 1 Lloyd iteration, 2 probes); output = one
    * row (n_truth, n_hit, recall_ppm). The DuckDB oracle replays the
    * corpus construction, the k-means training, both searches, and
    * the intersection — a green hash proves the recall VALUE, not
    * just the pipeline shape. The >= 0.8 floor stays machine-asserted
    * in RecallSpec against this same registered query. */
  def annRecallClustered(spark: SparkSession, dir: String): DataFrame = {
    val v = clusteredCorpus(spark, dir)
    val centers = KMeans.fitCenters(v, 0L until 16L, iters = 1)
    val ann = Similarity.knnGraphTopK(v, centers, K, nprobe = 2)
      .select(col("q_id").as("a_q"), col("n_id").as("a_n"))
    val truth = Similarity.bruteForceTopK(v, v, K)
      .select(col("q_id"), col("n_id"))
    truth.join(ann,
        col("q_id") === col("a_q") && col("n_id") === col("a_n"), "left")
      .agg(count(lit(1)).as("n_truth"), count(col("a_q")).as("n_hit"))
      .select(col("n_truth"), col("n_hit"),
        floor(col("n_hit") * 1e6d / col("n_truth")).cast("long").as("recall_ppm"))
  }

  /** PCA hash-checked END TO END — fit (distributed mean/Gram, driver
    * Jacobi) plus the shuffle-free [[Pca.project]] against the DuckDB
    * oracle's relational replay of the same arithmetic.
    *
    * Exactness construction (the k-means-oracle trick, § above):
    * features are the first two embedding coordinates QUANTIZED TO
    * INTEGERS (×1000, |x| ≤ ~400), so every partial sum and Gram
    * product the distributed pass accumulates is an integer far below
    * 2^53 — double addition over them is exact and ORDER-FREE, which
    * makes the covariance bit-identical across any partitioning and
    * bit-identical to the oracle's BIGINT sums. From there both sides
    * run the identical IEEE op sequence: one 2×2 Jacobi rotation
    * (closed form — the oracle replays theta/t/c/s and the two-sided
    * rotation literally), descending-eigenvalue order with stable
    * ties, largest-|coordinate|-positive sign canonicalization,
    * axes rounded to FLOAT, [[graft.expressions.DotExpr]]'s
    * left-fold double dot, minus the double centering dot, rounded to
    * FLOAT, scaled to integer ten-thousandths. */
  def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    val feats = Tables.spread(Tables.embeddings(spark, dir)).select(
      col("vec_id"),
      array(
        floor(element_at(col("embedding"), 1).cast("double") * lit(1000.0)
          + lit(0.5)).cast("float"),
        floor(element_at(col("embedding"), 2).cast("double") * lit(1000.0)
          + lit(0.5)).cast("float")).as("vec"))
    val m = Pca.fit(feats, "vec", 2)
    Pca.project(feats, "vec", m, "pc")
      .select(col("vec_id"),
        floor(element_at(col("pc"), 1).cast("double") * lit(10000.0)
          + lit(0.5)).as("pc0_c"),
        floor(element_at(col("pc"), 2).cast("double") * lit(10000.0)
          + lit(0.5)).as("pc1_c"))
  }

  // NOTE: construction is NOT lazy for the trained-index queries —
  // KMeans.fitCenters and Pq.fitCodebooks run their (small, driver-
  // collected) training jobs at DataFrame-construction time, and the
  // semdedup family's component closure checkpoints eagerly. Same
  // declared envelope as cms_freq/avgdl (see CurationQueries): plan
  // inspection is not free for these entries.
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pca_project"     -> (pcaProject _),
    "ann_topk"        -> (annTopK _),
    "ann_ivf"         -> (annIvf _),
    "ann_ivf_probe2"  -> (annIvfProbe2 _),
    "embedding_dedup" -> (embeddingDedup _),
    "embedding_dedup_trained" -> (embeddingDedupTrained _),
    "embedding_dedup_incr" -> (embeddingDedupIncr _),
    "embedding_dedup_auto_incr" -> (embeddingDedupAutoIncr _),
    "embedding_dedup_payload_auto_incr" -> (embeddingDedupPayloadAutoIncr _),
    "embedding_dedup_full_auto_incr" -> (embeddingDedupFullAutoIncr _),
    "embedding_dedup_pq_incr" -> (embeddingDedupPqIncr _),
    "embedding_dedup_ivf2_incr" -> (embeddingDedupIvf2Incr _),
    "embedding_dedup_ivf2_pq_incr" -> (embeddingDedupIvf2PqIncr _),
    "embedding_dedup_srp" -> (embeddingDedupSrp _),
    "semdedup"        -> (semDedup _),
    "semdedup_pq"     -> (semDedupPq _),
    "ann_srp" -> (annSrp _),
    "knn_graph_brute" -> (knnGraphBrute _),
    "knn_graph_ivf"   -> (knnGraphIvf _),
    "knn_graph_ivf2"  -> (knnGraphIvf2 _),
    "knn_graph_ivf2pq" -> (knnGraphIvf2Pq _),
    "knn_graph_auto"  -> (knnGraphAuto _),
    "knn_graph_payload_auto" -> (knnGraphPayloadAuto _),
    "knn_graph_full_auto" -> (knnGraphFullAuto _),
    "knn_graph_probe_auto" -> (knnGraphProbeAuto _),
    "ann_recall_clustered" -> (annRecallClustered _),
    "pq_recon_error"  -> (pqReconError _),
    "ann_pq"          -> (annPq _),
    "ann_ivfpq"       -> (annIvfPq _),
    "ann_pq_rerank"   -> (annPqRerank _),
    "ann_bq"          -> (annBq _),
    "ann_bq_rerank"   -> (annBqRerank _),
    "knn_graph_ivfpq" -> (knnGraphIvfPq _),
    "knn_graph_ivfpq_rerank" -> (knnGraphIvfPqRerank _),
    "knn_graph_srp"   -> (knnGraphSrp _),
    "knn_graph_srp_scaled" -> (knnGraphSrpScaled _),
    "knn_graph_srp_auto" -> (knnGraphSrpAuto _)
  )

  // ---------------------------------------------------------------- oracles

  /** DuckDB double-precision left-fold dot product of list exprs. */
  private def dotSql(a: String, b: String) =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  /** The PER-SUBSPACE-GROUPED PQ dot (mirror of
    * [[graft.expressions.PqAdcDotExpr]]/[[graft.expressions.PqSdcDotExpr]]'s
    * grouping): an ascending-index fold within each subspace, partials
    * summed ascending-s. Works for any two full-dim lists (float query
    * x reconstruction, or reconstruction x reconstruction). */
  private def pqDotSql(a: String, b: String,
      m: Int = PqM, subDim: Int = PqSubDim) =
    s"""list_reduce(list_transform(generate_series(0, ${m - 1}),
       |  s -> list_reduce(list_transform(generate_series(1, $subDim),
       |         i -> CAST($a[s*$subDim+i] AS DOUBLE) * CAST($b[s*$subDim+i] AS DOUBLE)),
       |       (x, y) -> x + y)),
       |  (x, y) -> x + y)""".stripMargin

  /** SQL replay of [[sdcGateFor]]: exact BIGINT recon-score sum,
    * IEEE double mean and square, floor — emitted as `pgate(g)`.
    * Expects `vn` and `prec`; `pred` restricts the measurement to
    * the training slice. */
  private[queries] def pqGateSql(pred: String = "TRUE"): String =
    s"""pgate AS (
       |  SELECT CAST(floor(400000.0
       |           * (CAST(sum(sc) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6)
       |           * (CAST(sum(sc) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6))
       |         AS BIGINT) AS g
       |  FROM (SELECT ${pqScaledSql("vn.vec", "r.rvec", "vn.nrm", "r.rnrm")} AS sc
       |        FROM vn JOIN prec r ON vn.id = r.id WHERE $pred) _rs)""".stripMargin

  /** Scaled cosine over the grouped PQ dot (mirror of
    * `scaledFromParts(pq dot, na, nb)`). */
  private[queries] def pqScaledSql(a: String, b: String, na: String, nb: String) =
    s"CAST(floor(${pqDotSql(a, b)} / ($na * $nb) * 1e6 + 0.5) AS BIGINT)"

  /** SQL replay of [[Pq.fitCodebooks]] (one Lloyd iteration) +
    * encode + reconstruct — the PQ mirror of [[trainedCentersSql]]:
    *
    *  1. `psub`: every vector sliced into its m subvectors;
    *  2. `pq0`: init codes = subvectors of the rows with id < ks;
    *  3. `pasg0`: argmin-L2 assignment via the exact expansion
    *     `floor((c.c - 2 x.c) * 1e6 + 0.5)` (x.x constant, dropped),
    *     ties to the smaller code id — [[graft.expressions.PqEncodeExpr]]'s
    *     rule verbatim;
    *  4. `pel`/`pmm`/`pcb`: per-(subspace, code, position) member
    *     mean via the exact integer-sum formula, CAST to FLOAT;
    *  5. `penc`: re-encode against the refined codes;
    *  6. `prec`: reconstruction = code vectors flattened in subspace
    *     order; `rnrm` = sqrt of the ascending-s sum of per-subspace
    *     self-dots ([[graft.expressions.PqNormExpr]]'s grouping).
    *
    * Emits `prec(id, rvec, rnrm)`; expects a prior CTE
    * `vn(id, vec, nrm)`. */
  private[queries] def pqCodebookSql(ks: Int = PqKs, m: Int = PqM,
      subDim: Int = PqSubDim,
      trainPred: String => String = _ => "TRUE"): String =
    s"""psub AS (SELECT id, s, list_slice(vec, s*$subDim+1, (s+1)*$subDim) AS x
       |         FROM vn CROSS JOIN generate_series(0, ${m - 1}) AS pgs(s)),
       |pq0 AS (SELECT s, CAST(id AS INTEGER) AS code, x AS c
       |        FROM psub WHERE id < $ks AND ${trainPred("id")}),
       |pasg0 AS (SELECT id, s, code FROM (
       |  SELECT psub.id, psub.s, pq0.code,
       |         row_number() OVER (PARTITION BY psub.id, psub.s
       |           ORDER BY CAST(floor((${dotSql("pq0.c", "pq0.c")} - 2*${dotSql("psub.x", "pq0.c")}) * 1e6 + 0.5) AS BIGINT) ASC,
       |                    pq0.code ASC) AS rn
       |  FROM psub JOIN pq0 ON psub.s = pq0.s) WHERE rn = 1),
       |pel AS (SELECT a.s, a.code, unnest(generate_series(1, len(p.x))) AS pos,
       |               unnest(p.x) AS e
       |        FROM pasg0 a JOIN psub p ON a.id = p.id AND a.s = p.s
       |        WHERE ${trainPred("a.id")}),
       |pmm AS (SELECT s, code, pos,
       |          CAST(sum(CAST(floor(CAST(e AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
       |            / 1e9 / count(*) AS mv
       |        FROM pel GROUP BY s, code, pos),
       |pcb AS (SELECT s, code, list(CAST(mv AS FLOAT) ORDER BY pos ASC) AS c
       |        FROM pmm GROUP BY s, code),
       |penc AS (SELECT id, s, code FROM (
       |  SELECT psub.id, psub.s, pcb.code,
       |         row_number() OVER (PARTITION BY psub.id, psub.s
       |           ORDER BY CAST(floor((${dotSql("pcb.c", "pcb.c")} - 2*${dotSql("psub.x", "pcb.c")}) * 1e6 + 0.5) AS BIGINT) ASC,
       |                    pcb.code ASC) AS rn
       |  FROM psub JOIN pcb ON psub.s = pcb.s) WHERE rn = 1),
       |prec AS (SELECT e.id, flatten(list(p.c ORDER BY e.s ASC)) AS rvec,
       |                sqrt(list_reduce(list(${dotSql("p.c", "p.c")} ORDER BY e.s ASC),
       |                  (x, y) -> x + y)) AS rnrm
       |         FROM penc e JOIN pcb p ON e.s = p.s AND e.code = p.code
       |         GROUP BY e.id)""".stripMargin

  private def cosScaledSql(a: String, b: String) =
    s"""CAST(floor(${dotSql(a, b)} /
       |  (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) * 1e6 + 0.5) AS BIGINT)""".stripMargin

  /** Scaled cosine from a precomputed dot + norms — the SQL mirror of
    * [[Similarity.scaledFromParts]]. */
  private[queries] def scaledPartsSql(a: String, b: String, na: String, nb: String): String =
    s"CAST(floor(${dotSql(a, b)} / ($na * $nb) * 1e6 + 0.5) AS BIGINT)"

  /** CTE chain for the binary-quantization replay ([[graft.sim.BitQ]]):
    * `bqs` — the md5 Rademacher diagonal; `brot(id, rv, nrm)` — the
    * exact rotated corpus (every element `CAST(vec[i] AS DOUBLE) *
    * ±1.0` is IEEE-exact); `benc(id, rv, nrm, bsum)` — the RaBitQ
    * per-vector correction sum as the same ascending fold
    * [[graft.expressions.BqEncodeExpr]] performs. Expects a prior
    * `vn(id, vec, nrm)`. NOTE: no continuation line may start with
    * "||" (the stripMargin interaction documented at
    * [[srpBucketsSql]]). */
  private val bqEncSql: String =
    """bqs AS (
      |  SELECT [CASE WHEN CAST('0x' || substr(md5('bq:0:0:' ||
      |            CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 0
      |          THEN 1.0 ELSE -1.0 END
      |     for i in generate_series(0, 63)] AS s
      |), brot AS (
      |  SELECT vn.id, [CAST(vn.vec[i] AS DOUBLE) * b.s[i]
      |     for i in generate_series(1, 64)] AS rv, vn.nrm
      |  FROM vn CROSS JOIN bqs b
      |), benc AS (
      |  SELECT id, rv, nrm,
      |         list_reduce(list_transform(generate_series(1, 64),
      |           i -> rv[i] * (CASE WHEN rv[i] > 0 THEN 1.0 ELSE -1.0 END)),
      |           (x, y) -> x + y) AS bsum
      |  FROM brot
      |)""".stripMargin

  /** The scaled BQ cosine estimate of one (rotated-query, candidate)
    * pair — the SQL mirror of [[graft.sim.BitQ.scaledEst]] over
    * [[graft.sim.BitQ.bqDot]]. The candidate's sign direction is
    * replayed from its rotated values: `rv[i] > 0` tests the
    * identical IEEE product the stored code bit was derived from, so
    * the two formulations agree bit-for-bit, and every product here
    * is an exact ±1.0 flip — the ascending fold is the only rounding
    * sequence, shared with the Spark expression. */
  private def bqEstSql(qrv: String, crv: String, qnrm: String,
      cbsum: String, cnrm: String): String =
    s"""CAST(floor(list_reduce(list_transform(generate_series(1, 64),
       |    i -> $qrv[i] * (CASE WHEN $crv[i] > 0 THEN 1.0 ELSE -1.0 END)),
       |    (x, y) -> x + y)
       |  * $cnrm / ($cbsum * $qnrm) * 1e6 + 0.5) AS BIGINT)""".stripMargin

  /** CTE attaching the precomputed norm: vn(id, vec, nrm) over a
    * source CTE `v(id, vec)`. */
  private[queries] def vnSql: String =
    s"vn AS (SELECT id, vec, sqrt(${dotSql("vec", "vec")}) AS nrm FROM v)"

  /** CTE chain ending in `bkt(id, band, bkt)` — the SQL replay of
    * [[Similarity.srpBuckets]]: hyperplanes regenerated from the same
    * md5 construction, projections as the same ordered left-fold dot.
    * Expects a prior CTE `vn(id, vec, nrm)`. */
  /** [[srpBucketsSql]] with the plane count chosen by the ENGINE RULE
    * ([[Similarity.planesFor]]) replayed relationally: smallest p with
    * (count(*) >> p) <= occupancy, floored at minPlanes — integer
    * arithmetic only, so the boundary cannot drift between engines. */
  private def srpBucketsAutoSql(bands: Int, occupancy: Long,
      minPlanes: Int): String =
    s"""np AS (
      |  SELECT greatest($minPlanes, min(p)) AS pl
      |  FROM generate_series(0, 62) AS gs(p)
      |  WHERE ((SELECT count(*) FROM v) >> p) <= $occupancy
      |), planes AS (
      |  SELECT b, p,
      |    [CASE WHEN CAST('0x' || substr(md5('srp:' || CAST(b AS VARCHAR) ||
      |            ':' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
      |            1, 15) AS BIGINT) % 2 = 0
      |          THEN 1.0 ELSE -1.0 END
      |     for i in generate_series(0, 63)] AS s
      |  FROM generate_series(0, ${bands - 1}) AS gb(b),
      |       generate_series(0, 61) AS gp(p)
      |  WHERE p < (SELECT pl FROM np)
      |), proj AS (
      |  SELECT vn.id, pl.b AS band, pl.p,
      |         ${dotSql("vn.vec", "pl.s")} AS pr
      |  FROM vn CROSS JOIN planes pl
      |), bkt AS (
      |  SELECT id, band,
      |         CAST(sum(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bkt
      |  FROM proj GROUP BY id, band
      |)""".stripMargin

  private def srpBucketsSql(bands: Int, planes: Int): String =
    // NOTE: no continuation line below may start with "||" — this CTE
    // is interpolated into oracle strings that stripMargin AGAIN,
    // which would eat the first pipe of a leading "||".
    s"""planes AS (
      |  SELECT b, p,
      |    [CASE WHEN CAST('0x' || substr(md5('srp:' || CAST(b AS VARCHAR) ||
      |            ':' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
      |            1, 15) AS BIGINT) % 2 = 0
      |          THEN 1.0 ELSE -1.0 END
      |     for i in generate_series(0, 63)] AS s
      |  FROM generate_series(0, ${bands - 1}) AS gb(b),
      |       generate_series(0, ${planes - 1}) AS gp(p)
      |), proj AS (
      |  SELECT vn.id, pl.b AS band, pl.p,
      |         ${dotSql("vn.vec", "pl.s")} AS pr
      |  FROM vn CROSS JOIN planes pl
      |), bkt AS (
      |  SELECT id, band,
      |         CAST(sum(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bkt
      |  FROM proj GROUP BY id, band
      |)""".stripMargin

  /** The clustered perturbation corpus as SQL (mirror of
    * [[clusteredCorpus]]): 40 base vectors x 5 members, coordinate
    * perturbed by ±0.02·j with md5-drawn signs, DOUBLE math, FLOAT
    * cast. NOTE: no continuation line may start with "||" (the
    * stripMargin interaction documented at [[srpBucketsSql]]). */
  private val clusteredSql =
    """v AS (
      |  SELECT b.vec_id * 5 + gj.j AS id,
      |    [CAST(CAST(b.embedding[i + 1] AS DOUBLE) +
      |          CAST(0.02 AS DOUBLE) * CAST(gj.j AS DOUBLE) *
      |          (CASE WHEN CAST('0x' || substr(md5('cl:' ||
      |              CAST(b.vec_id AS VARCHAR) || ':' || CAST(gj.j AS VARCHAR) ||
      |              ':' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 0
      |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)
      |     AS FLOAT) for i in generate_series(0, 63)] AS vec
      |  FROM embeddings b CROSS JOIN generate_series(0, 4) AS gj(j)
      |  WHERE b.vec_id < 40
      |)""".stripMargin

  /** The augmented ×4 rotation corpus as SQL (mirror of
    * [[augmentedVectors]]). */
  private val augmentedSql =
    """v0 AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
      |v AS (SELECT id * 4 AS id, vec FROM v0
      |      UNION ALL SELECT id * 4 + 1, vec[17:64] || vec[1:16] FROM v0
      |      UNION ALL SELECT id * 4 + 2, vec[33:64] || vec[1:32] FROM v0
      |      UNION ALL SELECT id * 4 + 3, vec[49:64] || vec[1:48] FROM v0)""".stripMargin

  /** SQL replay of `KMeans.fitCenters(v, 0 until cells, iters = 1)`
    * followed by the final nearest-center ranking — the exact
    * relational unrolling of one Lloyd iteration:
    *
    *  1. `c0`: initial centers = corpus rows with id < cells (the
    *     `initIds = 0 until cells` filter);
    *  2. `a0`: argmax-cosine assignment to the initial centers
    *     (score desc, center id asc — [[graft.expressions.TopCentersExpr]]'s
    *     tie-break);
    *  3. `mm`/`cc`: per-(cell, position) member mean via the SAME
    *     exact integer-sum formula as [[KMeans.stepCenters]]
    *     (`sum(floor(x*1e9+0.5)::BIGINT)::DOUBLE / 1e9 / count`), then
    *     CAST to FLOAT — bit-identical to Scala's `.toFloat` (both
    *     IEEE round-to-nearest); empty cells drop out of the GROUP BY
    *     exactly as they drop from the Scala map;
    *  4. `ranked_assign`: rank every vector's top-`nprobe` cells
    *     against the REFINED centers.
    *
    * Emits CTE `ranked_assign(id, vec, nrm, bucket, rn)`; expects a
    * prior CTE `vn(id, vec, nrm)`. */
  private[queries] def trainedAssignSql(cellsSql: String, nprobe: Int,
      trainSrc: String = "vn"): String =
    s"""${trainedCentersSql(cellsSql, trainSrc)},
       |ranked_assign AS (
       |  SELECT id, vec, nrm, bucket, rn FROM (
       |    SELECT vn.id, vn.vec, vn.nrm, cn.c_id AS bucket,
       |           row_number() OVER (PARTITION BY vn.id
       |             ORDER BY ${scaledPartsSql("vn.vec", "cn.c_vec", "vn.nrm", "cn.c_nrm")} DESC,
       |                      cn.c_id ASC) AS rn
       |    FROM vn CROSS JOIN cn) WHERE rn <= $nprobe)""".stripMargin

  /** The training half of [[trainedAssignSql]]: CTEs up to
    * `cn(c_id, c_vec, c_nrm)` — the Lloyd-refined fine centers.
    * `src` names the training-corpus CTE (default the full `vn`; the
    * incremental row trains on the base subset only). */
  private def trainedCentersSql(cellsSql: String, src: String = "vn"): String =
    s"""c0 AS (SELECT id AS c_id, vec AS c_vec, nrm AS c_nrm
       |       FROM $src WHERE id < ($cellsSql)),
       |a0 AS (
       |  SELECT id, vec, c_id AS bucket FROM (
       |    SELECT $src.id, $src.vec, c0.c_id,
       |           row_number() OVER (PARTITION BY $src.id
       |             ORDER BY ${scaledPartsSql(s"$src.vec", "c0.c_vec", s"$src.nrm", "c0.c_nrm")} DESC,
       |                      c0.c_id ASC) AS rn
       |    FROM $src CROSS JOIN c0) WHERE rn = 1),
       |el AS (SELECT bucket, unnest(generate_series(1, len(vec))) AS pos,
       |              unnest(vec) AS x FROM a0),
       |mm AS (SELECT bucket, pos,
       |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
       |           / 1e9 / count(*) AS m
       |       FROM el GROUP BY bucket, pos),
       |cc AS (SELECT bucket AS c_id, list(CAST(m AS FLOAT) ORDER BY pos ASC) AS c_vec
       |       FROM mm GROUP BY bucket),
       |cn AS (SELECT c_id, c_vec, sqrt(${dotSql("c_vec", "c_vec")}) AS c_nrm FROM cc)""".stripMargin

  /** SQL replay of the TWO-LEVEL assignment
    * ([[Similarity.buildTwoLevelIndex]] +
    * [[Similarity.rankedCellsTwoLevel]]) over the `cn` fine centers:
    * init coarse = the coarseK lowest-id fine centers (coarseK =
    * max(4, round(sqrt(|fine|))) — the n^(1/4) rule), fine centers
    * grouped under their argmax init-coarse, coarse centers REFINED to
    * the exact-integer-sum group means (el2/mm2/co — the hub-cell fix,
    * see buildTwoLevelIndex), vectors ranked refined-coarse-then-fine
    * with the identical (score DESC, id ASC) tie-break at both
    * levels. Emits `ranked_assign(id, vec, nrm, bucket, rn)`; expects
    * prior CTEs `vn` and `cn`. */
  private def twoLevelAssignSql(nprobe: Int): String =
    s"""ckv AS (SELECT GREATEST(4, CAST(floor(sqrt(count(*)) + 0.5) AS BIGINT)) AS ck
       |        FROM cn),
       |co0 AS (SELECT c_id AS o_id, c_vec AS o_vec, c_nrm AS o_nrm FROM (
       |         SELECT cn.*, row_number() OVER (ORDER BY c_id ASC) AS rn FROM cn)
       |       WHERE rn <= (SELECT ck FROM ckv)),
       |fg AS (SELECT c_id, c_vec, c_nrm, o_id AS g FROM (
       |         SELECT cn.c_id, cn.c_vec, cn.c_nrm, co0.o_id,
       |                row_number() OVER (PARTITION BY cn.c_id
       |                  ORDER BY ${scaledPartsSql("cn.c_vec", "co0.o_vec", "cn.c_nrm", "co0.o_nrm")} DESC,
       |                           co0.o_id ASC) AS rn
       |         FROM cn CROSS JOIN co0) WHERE rn = 1),
       |el2 AS (SELECT g, unnest(generate_series(1, len(c_vec))) AS pos,
       |               unnest(c_vec) AS x FROM fg),
       |mm2 AS (SELECT g, pos,
       |          CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
       |            / 1e9 / count(*) AS m
       |        FROM el2 GROUP BY g, pos),
       |co AS (SELECT g AS o_id, list(CAST(m AS FLOAT) ORDER BY pos ASC) AS o_vec
       |       FROM mm2 GROUP BY g),
       |con AS (SELECT o_id, o_vec, sqrt(${dotSql("o_vec", "o_vec")}) AS o_nrm FROM co),
       |vc AS (SELECT id, vec, nrm, o_id AS g FROM (
       |         SELECT vn.id, vn.vec, vn.nrm, con.o_id,
       |                row_number() OVER (PARTITION BY vn.id
       |                  ORDER BY ${scaledPartsSql("vn.vec", "con.o_vec", "vn.nrm", "con.o_nrm")} DESC,
       |                           con.o_id ASC) AS rn
       |         FROM vn CROSS JOIN con) WHERE rn = 1),
       |ranked_assign AS (
       |  SELECT id, vec, nrm, bucket, rn FROM (
       |    SELECT vc.id, vc.vec, vc.nrm, fg.c_id AS bucket,
       |           row_number() OVER (PARTITION BY vc.id
       |             ORDER BY ${scaledPartsSql("vc.vec", "fg.c_vec", "vc.nrm", "fg.c_nrm")} DESC,
       |                      fg.c_id ASC) AS rn
       |    FROM vc JOIN fg ON vc.g = fg.g) WHERE rn <= $nprobe)""".stripMargin

  /** sqrt(n)-cell count in SQL — mirror of [[sqrtCells]] (Scala
    * `.round` = floor(x + 0.5) for positive x). */
  private val sqrtCellsSql =
    "SELECT GREATEST(8, CAST(floor(sqrt(count(*)) + 0.5) AS BIGINT)) FROM v"

  /** Query-side IVF search over `ranked_assign`: queries = id < 8,
    * probing their `nprobe` nearest cells; corpus side = rank-1 cell
    * assignment; exact top-K per query. */
  private def ivfSearchSql: String =
    s"""assign AS (SELECT id, vec, nrm, bucket FROM ranked_assign WHERE rn = 1),
       |q AS (SELECT id AS q_id, vec AS q_vec, nrm AS q_nrm, bucket
       |      FROM ranked_assign WHERE id < 8),
       |scored AS (
       |  SELECT q.q_id, a.id AS n_id,
       |         ${scaledPartsSql("q.q_vec", "a.vec", "q.q_nrm", "a.nrm")} AS score_c
       |  FROM q JOIN assign a ON q.bucket = a.bucket AND q.q_id <> a.id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY score_c DESC, n_id ASC) AS rank
       |  FROM scored)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
       |FROM ranked WHERE rank <= $K""".stripMargin

  /** Self-kNN search tail over `ranked_assign`: every vector probes
    * its ranked cells (rows of `ranked_assign`), candidates are the
    * rank-1 cell members, exact top-K per query — the shared tail of
    * the IVF kNN-graph oracles (mirror of `Similarity.knnFromRanked`). */
  private def selfKnnTailSql: String =
    s"""assign AS (SELECT id, vec, nrm, bucket FROM ranked_assign WHERE rn = 1),
       |scored AS (
       |  SELECT p.id AS q_id, a.id AS n_id,
       |         ${scaledPartsSql("p.vec", "a.vec", "p.nrm", "a.nrm")} AS score_c
       |  FROM ranked_assign p JOIN assign a
       |    ON p.bucket = a.bucket AND p.id <> a.id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY score_c DESC, n_id ASC) AS rank
       |  FROM scored)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
       |FROM ranked WHERE rank <= $K""".stripMargin

  /** PQ self-kNN tail over `ranked_assign` + `prec`: probes and
    * rank-1 residents both join their reconstructions, in-cell pairs
    * score via the grouped PQ (SDC) dot, exact top-K per query — the
    * shared tail of the compressed kNN-graph oracles (mirror of
    * `Similarity.knnFromRankedPayload` with the LUT scorer), reused
    * by the flat (`knn_graph_ivfpq`) and two-level
    * (`knn_graph_ivf2pq`) assignments unchanged. */
  private def pqSelfKnnTailSql: String =
    s"""passign AS (
       |  SELECT r.id, r.bucket, rc.rvec, rc.rnrm
       |  FROM ranked_assign r JOIN prec rc ON r.id = rc.id WHERE r.rn = 1),
       |pprobe AS (
       |  SELECT r.id, r.bucket, rc.rvec, rc.rnrm
       |  FROM ranked_assign r JOIN prec rc ON r.id = rc.id),
       |scored AS (
       |  SELECT p.id AS q_id, a.id AS n_id,
       |         ${pqScaledSql("p.rvec", "a.rvec", "p.rnrm", "a.rnrm")} AS score_c
       |  FROM pprobe p JOIN passign a
       |    ON p.bucket = a.bucket AND p.id <> a.id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY score_c DESC, n_id ASC) AS rank
       |  FROM scored)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
       |FROM ranked WHERE rank <= $K""".stripMargin

  /** In-cell near-dup pairs over `ranked_assign` (mirror of
    * [[dedupPairs]]). */
  private def dedupPairsSql: String =
    s"""assign AS (SELECT id, vec, nrm, bucket FROM ranked_assign WHERE rn = 1)
       |SELECT id_a, id_b, score_c FROM (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |         ${scaledPartsSql("a.vec", "b.vec", "a.nrm", "b.nrm")} AS score_c
       |  FROM assign a JOIN assign b ON a.bucket = b.bucket AND a.id < b.id)
       |WHERE score_c >= 400000""".stripMargin

  /** SQL replay of [[Pca.fit]] + [[Pca.project]] on the 2-dim
    * integer-quantized features — every CTE mirrors one stage of the
    * Scala arithmetic in the same IEEE op order (see [[pcaProject]]):
    * exact BIGINT mean/Gram sums; covariance `g/n - m_i*m_j`; the
    * jacobiEigen entry check (`offDiag > 1e-12 * frobenius`, rotation
    * guard `|C| > 1e-300`); one literal two-sided rotation; stable
    * descending eigenvalue order; first-max sign pivot; FLOAT-rounded
    * axes; DotExpr's `(x0*a0) + (x1*a1)` fold minus the double
    * centering dot, rounded to FLOAT and scaled. */
  private val pcaProjectSql: String =
    """WITH f AS (
      |  SELECT vec_id,
      |         floor(CAST(embedding[1] AS DOUBLE) * 1000.0 + 0.5) AS x0,
      |         floor(CAST(embedding[2] AS DOUBLE) * 1000.0 + 0.5) AS x1
      |  FROM embeddings
      |), agg AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(CAST(x0 AS BIGINT)) AS DOUBLE) AS s0,
      |         CAST(sum(CAST(x1 AS BIGINT)) AS DOUBLE) AS s1,
      |         CAST(sum(CAST(x0 AS BIGINT) * CAST(x0 AS BIGINT)) AS DOUBLE) AS g00,
      |         CAST(sum(CAST(x0 AS BIGINT) * CAST(x1 AS BIGINT)) AS DOUBLE) AS g01,
      |         CAST(sum(CAST(x1 AS BIGINT) * CAST(x1 AS BIGINT)) AS DOUBLE) AS g11
      |  FROM f
      |), mz AS (
      |  SELECT n, g00, g01, g11, s0 / n AS m0, s1 / n AS m1 FROM agg
      |), cv AS (
      |  SELECT n, m0, m1,
      |         g00 / n - m0 * m0 AS a,
      |         g01 / n - m0 * m1 AS c,
      |         g11 / n - m1 * m1 AS b
      |  FROM mz
      |), j0 AS (
      |  SELECT *,
      |    CASE WHEN sqrt(c*c) >
      |           1e-12 * greatest(sqrt(((a*a + c*c) + c*c) + b*b), 1e-300)
      |         AND abs(c) > 1e-300
      |         THEN 1 ELSE 0 END AS do_rot
      |  FROM cv
      |), th AS (
      |  SELECT *,
      |    CASE WHEN do_rot = 1 THEN (b - a) / (2.0 * c) ELSE 0.0 END AS theta
      |  FROM j0
      |), tv AS (
      |  SELECT *,
      |    CASE WHEN do_rot = 0 THEN 0.0
      |         WHEN theta = 0.0 THEN 1.0
      |         ELSE (CASE WHEN theta < 0.0 THEN -1.0 ELSE 1.0 END)
      |              / (abs(theta) + sqrt(theta * theta + 1.0)) END AS t
      |  FROM th
      |), trig AS (
      |  SELECT *,
      |    CASE WHEN do_rot = 1 THEN 1.0 / sqrt(t*t + 1.0) ELSE 1.0 END AS cth,
      |    CASE WHEN do_rot = 1
      |         THEN t * (1.0 / sqrt(t*t + 1.0)) ELSE 0.0 END AS sth
      |  FROM tv
      |), rotm AS (
      |  SELECT *,
      |    cth * a - sth * c AS a00_1,
      |    sth * a + cth * c AS a01_1,
      |    cth * c - sth * b AS a10_1,
      |    sth * c + cth * b AS a11_1
      |  FROM trig
      |), eig AS (
      |  SELECT *,
      |    cth * a00_1 - sth * a10_1 AS lam0,
      |    sth * a01_1 + cth * a11_1 AS lam1,
      |    cth AS v00, 0.0 - sth AS v10, sth AS v01, cth AS v11
      |  FROM rotm
      |), ord AS (
      |  SELECT *,
      |    CASE WHEN lam1 > lam0 THEN v01 ELSE v00 END AS p0u0,
      |    CASE WHEN lam1 > lam0 THEN v11 ELSE v10 END AS p0u1,
      |    CASE WHEN lam1 > lam0 THEN v00 ELSE v01 END AS p1u0,
      |    CASE WHEN lam1 > lam0 THEN v10 ELSE v11 END AS p1u1
      |  FROM eig
      |), canon AS (
      |  SELECT *,
      |    CASE WHEN (CASE WHEN abs(p0u1) > abs(p0u0) THEN p0u1 ELSE p0u0 END)
      |           < 0.0 THEN -p0u0 ELSE p0u0 END AS e0x,
      |    CASE WHEN (CASE WHEN abs(p0u1) > abs(p0u0) THEN p0u1 ELSE p0u0 END)
      |           < 0.0 THEN -p0u1 ELSE p0u1 END AS e0y,
      |    CASE WHEN (CASE WHEN abs(p1u1) > abs(p1u0) THEN p1u1 ELSE p1u0 END)
      |           < 0.0 THEN -p1u0 ELSE p1u0 END AS e1x,
      |    CASE WHEN (CASE WHEN abs(p1u1) > abs(p1u0) THEN p1u1 ELSE p1u0 END)
      |           < 0.0 THEN -p1u1 ELSE p1u1 END AS e1y
      |  FROM ord
      |), md AS (
      |  SELECT m0, m1,
      |    CAST(CAST(e0x AS REAL) AS DOUBLE) AS a0x,
      |    CAST(CAST(e0y AS REAL) AS DOUBLE) AS a0y,
      |    CAST(CAST(e1x AS REAL) AS DOUBLE) AS a1x,
      |    CAST(CAST(e1y AS REAL) AS DOUBLE) AS a1y,
      |    (e0x * m0) + (e0y * m1) AS cd0,
      |    (e1x * m0) + (e1y * m1) AS cd1
      |  FROM canon
      |)
      |SELECT f.vec_id,
      |  CAST(floor(CAST(CAST((f.x0 * md.a0x + f.x1 * md.a0y) - md.cd0 AS REAL)
      |       AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS pc0_c,
      |  CAST(floor(CAST(CAST((f.x0 * md.a1x + f.x1 * md.a1y) - md.cd1 AS REAL)
      |       AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS pc1_c
      |FROM f CROSS JOIN md""".stripMargin

  /** Flat trained-IVF self-kNN replay — the batch truth of BOTH
    * `knn_graph_ivf` (the explicit flat operator) and
    * `knn_graph_auto` (the engine-chosen dispatch, which provably
    * takes the flat branch at every bench SF — see [[knnGraphAuto]]). */
  private val knnGraphIvfOracle: String =
    s"""WITH $augmentedSql,
      |$vnSql,
      |${trainedAssignSql(s"($sqrtCellsSql)", nprobe = 2)},
      |$selfKnnTailSql""".stripMargin

  /** Shared batch truth of the flat incremental-dedup maintenance
    * (`embedding_dedup_incr`) and its engine-chosen dispatcher row
    * (`embedding_dedup_auto_incr`, which provably takes the flat
    * branch at every bench SF): base-trained centers, every vector
    * assigned by them, in-cell pairs verified. */
  private val embeddingDedupIncrOracle: String =
    s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
      |$vnSql,
      |vb AS (SELECT * FROM vn WHERE id % 10 < 8),
      |${trainedAssignSql(
        "(SELECT GREATEST(8, CAST(floor(sqrt(count(*)) + 0.5) AS BIGINT)) FROM vb)",
        nprobe = 1, trainSrc = "vb")},
      |$dedupPairsSql""".stripMargin

  val oracles: Map[String, String] = Map(
    "pca_project" -> pcaProjectSql,
    "knn_graph_brute" ->
      s"""WITH $augmentedSql,
        |scored AS (
        |  SELECT q.id AS q_id, v.id AS n_id, ${cosScaledSql("q.vec", "v.vec")} AS score_c
        |  FROM v q JOIN v ON q.id <> v.id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin,
    "ann_topk" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |q AS (SELECT id AS q_id, vec AS q_vec FROM v WHERE id < 8),
        |scored AS (
        |  SELECT q_id, v.id AS n_id, ${cosScaledSql("q_vec", "v.vec")} AS score_c
        |  FROM q JOIN v ON q.q_id <> v.id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin,
    "ann_ivf" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${trainedAssignSql(TrainedK.toString, nprobe = 1)},
        |$ivfSearchSql""".stripMargin,
    "ann_ivf_probe2" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${trainedAssignSql(TrainedK.toString, nprobe = 2)},
        |$ivfSearchSql""".stripMargin,
    "embedding_dedup" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${trainedAssignSql(TrainedK.toString, nprobe = 1)},
        |$dedupPairsSql""".stripMargin,
    "embedding_dedup_trained" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${trainedAssignSql(s"($sqrtCellsSql)", nprobe = 1)},
        |$dedupPairsSql""".stripMargin,
    // Incremental maintenance replayed as the equivalent full batch:
    // centers train on the BASE subset only, every vector (base +
    // delta) is assigned by them, in-cell pairs verified — identical
    // to prior ∪ fresh because cells partition under fixed centers.
    "embedding_dedup_incr" -> embeddingDedupIncrOracle,
    // The dispatcher row: at every bench SF |centers| = sqrt(0.8n)
    // sits below FlatCentersMax, so assignerFor deterministically
    // takes the flat branch — its batch truth IS the flat replay,
    // shared verbatim with embedding_dedup_incr (the two-level
    // branch's truth is the embedding_dedup_ivf2_incr row).
    "embedding_dedup_auto_incr" -> embeddingDedupIncrOracle,
    // The payload dispatcher row: at every bench SF the float payload
    // (n x dim x 4 B) sits orders of magnitude under the 2 GiB
    // crossover, so the dispatch provably keeps the float exchange —
    // its batch truth IS the flat replay, shared verbatim with
    // embedding_dedup_incr (the compressed branch's truth is the
    // embedding_dedup_pq_incr row).
    "embedding_dedup_payload_auto_incr" -> embeddingDedupIncrOracle,
    // The composed (strategy x payload) dispatcher row: both
    // predicates land on the cheap-and-exact side at every bench SF
    // (sqrt(0.8n) centers < FlatCentersMax, payload << 2 GiB), so the
    // flat-float replay is its truth; the other three quadrants keep
    // their own oracle-checked rows (embedding_dedup_ivf2_incr,
    // embedding_dedup_pq_incr, embedding_dedup_ivf2_pq_incr).
    "embedding_dedup_full_auto_incr" -> embeddingDedupIncrOracle,
    // Two-level incremental maintenance replayed as the equivalent
    // full batch: fine centers train on the BASE subset only, the
    // coarse quantizer is built over them (ckv counts cn — the same
    // n^(1/4) rule as coarseKFor), every vector (base + delta) is
    // assigned coarse-then-fine by that fixed index, in-cell pairs
    // verified — identical to prior ∪ fresh because rank-1 two-level
    // assignment partitions the corpus under a fixed index.
    "embedding_dedup_ivf2_incr" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |vb AS (SELECT * FROM vn WHERE id % 10 < 8),
        |${trainedCentersSql(
          "(SELECT GREATEST(8, CAST(floor(sqrt(count(*)) + 0.5) AS BIGINT)) FROM vb)",
          src = "vb")},
        |${twoLevelAssignSql(nprobe = 1)},
        |$dedupPairsSql""".stripMargin,
    // SemDeDup: trained-cell pairs closed into clusters by a recursive
    // CTE (min reachable id = the component label, matching the
    // engine's Components convention), keep = singleton or cluster min.
    "semdedup" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${trainedAssignSql(s"($sqrtCellsSql)", nprobe = 1)},
        |assign AS (SELECT id, vec, nrm, bucket FROM ranked_assign WHERE rn = 1),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM assign a JOIN assign b ON a.bucket = b.bucket AND a.id < b.id
        |  WHERE ${scaledPartsSql("a.vec", "b.vec", "a.nrm", "b.nrm")} >= 400000
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs
        |), reach(id, comp) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id
        |), comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
        |SELECT v.id, coalesce(c.comp, v.id) AS cluster,
        |       CAST(CASE WHEN c.comp IS NULL OR c.comp = v.id
        |            THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM v LEFT JOIN comps c ON v.id = c.id""".stripMargin,
    // Incremental PQ maintenance replayed as the equivalent full
    // batch: centers AND codebook train on the BASE subset only
    // (the trainPred threads the id % 10 < 8 restriction through
    // init rows and member means), every vector is assigned and
    // encoded by them, in-cell pairs gate on the SDC prefilter and
    // verify exactly — identical to prior ∪ fresh because cells
    // partition under fixed centers and codes under a fixed codebook.
    "embedding_dedup_pq_incr" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |vb AS (SELECT * FROM vn WHERE id % 10 < 8),
        |${trainedAssignSql(
          "(SELECT GREATEST(8, CAST(floor(sqrt(count(*)) + 0.5) AS BIGINT)) FROM vb)",
          nprobe = 1, trainSrc = "vb")},
        |assign AS (SELECT id, vec, nrm, bucket FROM ranked_assign WHERE rn = 1),
        |${pqCodebookSql(trainPred = c => s"$c % 10 < 8")},
        |${pqGateSql(pred = "vn.id % 10 < 8")},
        |pcode AS (
        |  SELECT a.id, a.bucket, r.rvec, r.rnrm
        |  FROM assign a JOIN prec r ON a.id = r.id),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM pcode a JOIN pcode b
        |    ON a.bucket = b.bucket AND a.id < b.id
        |  WHERE ${pqScaledSql("a.rvec", "b.rvec", "a.rnrm", "b.rnrm")} >= (SELECT g FROM pgate))
        |SELECT c.id_a, c.id_b,
        |       ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} AS score_c
        |FROM cand c JOIN vn x ON c.id_a = x.id JOIN vn y ON c.id_b = y.id
        |WHERE ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} >= 400000""".stripMargin,
    // The fourth quadrant of the dedup matrix, composed from the two
    // proven replays exactly like knn_graph_ivf2pq's oracle: the
    // two-level assignment CTEs (base-trained fine centers + the
    // n^(1/4) coarse refinement) replace the flat assignment, and the
    // PQ codebook / SDC-gate / exact-verify tail runs unchanged.
    "embedding_dedup_ivf2_pq_incr" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |vb AS (SELECT * FROM vn WHERE id % 10 < 8),
        |${trainedCentersSql(
          "(SELECT GREATEST(8, CAST(floor(sqrt(count(*)) + 0.5) AS BIGINT)) FROM vb)",
          src = "vb")},
        |${twoLevelAssignSql(nprobe = 1)},
        |assign AS (SELECT id, vec, nrm, bucket FROM ranked_assign WHERE rn = 1),
        |${pqCodebookSql(trainPred = c => s"$c % 10 < 8")},
        |${pqGateSql(pred = "vn.id % 10 < 8")},
        |pcode AS (
        |  SELECT a.id, a.bucket, r.rvec, r.rnrm
        |  FROM assign a JOIN prec r ON a.id = r.id),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM pcode a JOIN pcode b
        |    ON a.bucket = b.bucket AND a.id < b.id
        |  WHERE ${pqScaledSql("a.rvec", "b.rvec", "a.rnrm", "b.rnrm")} >= (SELECT g FROM pgate))
        |SELECT c.id_a, c.id_b,
        |       ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} AS score_c
        |FROM cand c JOIN vn x ON c.id_a = x.id JOIN vn y ON c.id_b = y.id
        |WHERE ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} >= 400000""".stripMargin,
    // SemDeDup with the PQ pair stage: candidates are in-cell pairs
    // whose SDC score over reconstructions clears the prefilter, then
    // the float verify, recursive closure, and keep rule run exactly
    // as in the semdedup oracle.
    "semdedup_pq" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${trainedAssignSql(s"($sqrtCellsSql)", nprobe = 1)},
        |assign AS (SELECT id, vec, nrm, bucket FROM ranked_assign WHERE rn = 1),
        |${pqCodebookSql()},
        |${pqGateSql()},
        |passign AS (
        |  SELECT a.id, a.bucket, r.rvec, r.rnrm
        |  FROM assign a JOIN prec r ON a.id = r.id),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM passign a JOIN passign b
        |    ON a.bucket = b.bucket AND a.id < b.id
        |  WHERE ${pqScaledSql("a.rvec", "b.rvec", "a.rnrm", "b.rnrm")} >= (SELECT g FROM pgate)
        |), pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c JOIN vn x ON c.id_a = x.id JOIN vn y ON c.id_b = y.id
        |  WHERE ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} >= 400000
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs
        |), reach(id, comp) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id
        |), comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
        |SELECT v.id, coalesce(c.comp, v.id) AS cluster,
        |       CAST(CASE WHEN c.comp IS NULL OR c.comp = v.id
        |            THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM v LEFT JOIN comps c ON v.id = c.id""".stripMargin,
    // Full SRP replay: the hyperplanes are regenerated from the same
    // md5 construction, the projection is the same ordered left-fold
    // dot, and candidates are in-bucket pairs per band, deduped.
    "embedding_dedup_srp" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${srpBucketsSql(SrpBands, SrpPlanes)},
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, c.id AS id_b
        |  FROM bkt a JOIN bkt c
        |    ON a.band = c.band AND a.bkt = c.bkt AND a.id < c.id
        |)
        |SELECT c.id_a, c.id_b,
        |       ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} AS score_c
        |FROM cand c JOIN vn x ON c.id_a = x.id JOIN vn y ON c.id_b = y.id
        |WHERE ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} >= 400000""".stripMargin,
    "ann_srp" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${srpBucketsSql(4, SrpPlanes)},
        |cand AS (
        |  SELECT DISTINCT q.id AS q_id, c.id AS n_id
        |  FROM bkt q JOIN bkt c
        |    ON q.band = c.band AND q.bkt = c.bkt AND q.id <> c.id
        |  WHERE q.id < 8
        |), scored AS (
        |  SELECT cand.q_id, cand.n_id,
        |         ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} AS score_c
        |  FROM cand JOIN vn x ON cand.q_id = x.id JOIN vn y ON cand.n_id = y.id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin,
    "knn_graph_ivf" -> knnGraphIvfOracle,
    // The dispatcher row: at every bench SF |centers| = sqrt(4n) sits
    // below FlatCentersMax, so knnGraphTopKAuto deterministically
    // takes the exact flat branch — its batch truth IS the flat
    // replay, shared verbatim with knn_graph_ivf (the two-level
    // branch's truth is the knn_graph_ivf2 row).
    "knn_graph_auto" -> knnGraphIvfOracle,
    // The payload-dispatcher row: at every bench SF the float payload
    // (n x dim x 4 B) sits orders of magnitude under
    // FloatPayloadBytesMax, so knnGraphTopKPayloadAuto
    // deterministically keeps the exact float exchange — its batch
    // truth IS the flat replay, shared verbatim with knn_graph_ivf
    // (the compressed branch's truth is the knn_graph_ivfpq row).
    "knn_graph_payload_auto" -> knnGraphIvfOracle,
    // The composed (strategy x payload) dispatcher: at every bench SF
    // both predicates land on the flat-float quadrant, whose batch
    // truth is the same flat replay; the other three quadrants carry
    // their own oracle-checked rows.
    "knn_graph_full_auto" -> knnGraphIvfOracle,
    // The probe-count dispatcher row: at every bench SF the trained
    // histogram is near-uniform, so the candidate-volume rule provably
    // lands on the recall-gated nprobe=2 setting — its truth IS the
    // flat nprobe=2 replay, shared verbatim with knn_graph_ivf.
    "knn_graph_probe_auto" -> knnGraphIvfOracle,
    "knn_graph_ivf2" ->
      s"""WITH $augmentedSql,
        |$vnSql,
        |${trainedCentersSql(s"($sqrtCellsSql)")},
        |${twoLevelAssignSql(nprobe = 2)},
        |$selfKnnTailSql""".stripMargin,
    // Clustered-corpus recall: the corpus is regenerated from the same
    // md5-sign perturbation, both searches replayed, the intersection
    // counted — the hash pins the measured recall value.
    "ann_recall_clustered" ->
      s"""WITH $clusteredSql,
        |$vnSql,
        |${trainedAssignSql("16", nprobe = 2)},
        |assign AS (SELECT id, vec, nrm, bucket FROM ranked_assign WHERE rn = 1),
        |ascored AS (
        |  SELECT p.id AS q_id, a.id AS n_id,
        |         ${scaledPartsSql("p.vec", "a.vec", "p.nrm", "a.nrm")} AS score_c
        |  FROM ranked_assign p JOIN assign a
        |    ON p.bucket = a.bucket AND p.id <> a.id),
        |ann AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY score_c DESC, n_id ASC) AS rank
        |    FROM ascored) WHERE rank <= $K),
        |bscored AS (
        |  SELECT q.id AS q_id, c.id AS n_id,
        |         ${scaledPartsSql("q.vec", "c.vec", "q.nrm", "c.nrm")} AS score_c
        |  FROM vn q JOIN vn c ON q.id <> c.id),
        |truth AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY score_c DESC, n_id ASC) AS rank
        |    FROM bscored) WHERE rank <= $K)
        |SELECT CAST(count(*) AS BIGINT) AS n_truth,
        |       CAST(count(a.q_id) AS BIGINT) AS n_hit,
        |       CAST(floor(count(a.q_id) * 1e6 / count(*)) AS BIGINT) AS recall_ppm
        |FROM truth t LEFT JOIN ann a
        |  ON t.q_id = a.q_id AND t.n_id = a.n_id""".stripMargin,
    "pq_recon_error" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${pqCodebookSql()}
        |SELECT vn.id, ${pqScaledSql("vn.vec", "r.rvec", "vn.nrm", "r.rnrm")} AS score_c
        |FROM vn JOIN prec r ON vn.id = r.id""".stripMargin,
    "ann_pq" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${pqCodebookSql()},
        |q AS (SELECT id AS q_id, vec AS q_vec, nrm AS q_nrm FROM vn WHERE id < 8),
        |scored AS (
        |  SELECT q.q_id, r.id AS n_id,
        |         ${pqScaledSql("q.q_vec", "r.rvec", "q.q_nrm", "r.rnrm")} AS score_c
        |  FROM q JOIN prec r ON q.q_id <> r.id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin,
    // IVFADC: queries probe their 2 ranked cells with FLOAT vectors;
    // candidates are rank-1 residents joined to their reconstructions;
    // the score is the asymmetric grouped PQ dot.
    "ann_ivfpq" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${trainedAssignSql(TrainedK.toString, nprobe = 2)},
        |${pqCodebookSql()},
        |passign AS (
        |  SELECT r.id, r.bucket, rc.rvec, rc.rnrm
        |  FROM ranked_assign r JOIN prec rc ON r.id = rc.id WHERE r.rn = 1),
        |q AS (SELECT id AS q_id, vec AS q_vec, nrm AS q_nrm, bucket
        |      FROM ranked_assign WHERE id < 8),
        |scored AS (
        |  SELECT q.q_id, a.id AS n_id,
        |         ${pqScaledSql("q.q_vec", "a.rvec", "q.q_nrm", "a.rnrm")} AS score_c
        |  FROM q JOIN passign a ON q.bucket = a.bucket AND q.q_id <> a.id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin,
    // Two-stage: the IVFADC shortlist (rank <= 4K in code space) is
    // re-scored with the exact float cosine and re-ranked to top-K.
    "ann_pq_rerank" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${trainedAssignSql(TrainedK.toString, nprobe = 2)},
        |${pqCodebookSql()},
        |passign AS (
        |  SELECT r.id, r.bucket, rc.rvec, rc.rnrm
        |  FROM ranked_assign r JOIN prec rc ON r.id = rc.id WHERE r.rn = 1),
        |q AS (SELECT id AS q_id, vec AS q_vec, nrm AS q_nrm, bucket
        |      FROM ranked_assign WHERE id < 8),
        |pq_scored AS (
        |  SELECT q.q_id, a.id AS n_id,
        |         ${pqScaledSql("q.q_vec", "a.rvec", "q.q_nrm", "a.rnrm")} AS score_c
        |  FROM q JOIN passign a ON q.bucket = a.bucket AND q.q_id <> a.id),
        |short AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY score_c DESC, n_id ASC) AS rank
        |    FROM pq_scored) WHERE rank <= ${K * 4}),
        |rescored AS (
        |  SELECT s.q_id, s.n_id,
        |         ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} AS score_c
        |  FROM short s JOIN vn x ON s.q_id = x.id JOIN vn y ON s.n_id = y.id),
        |rr AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM rescored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM rr WHERE rank <= $K""".stripMargin,
    // Brute BQ: every (query, candidate) pair scored by the RaBitQ
    // estimate — rotation, sign direction, and correction sum all
    // replayed relationally from the md5 diagonal.
    "ann_bq" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |$bqEncSql,
        |q AS (SELECT id AS q_id, rv AS q_rv, nrm AS q_nrm
        |      FROM brot WHERE id < 8),
        |scored AS (
        |  SELECT q.q_id, c.id AS n_id,
        |         ${bqEstSql("q.q_rv", "c.rv", "q.q_nrm", "c.bsum", "c.nrm")} AS score_c
        |  FROM q JOIN benc c ON q.q_id <> c.id AND c.bsum > 0
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin,
    // Two-stage BQ: trained-cell blocking (rank-1 residents, 2-probe
    // queries), a 4K code-space shortlist, exact float re-rank.
    "ann_bq_rerank" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |$vnSql,
        |${trainedAssignSql(TrainedK.toString, nprobe = 2)},
        |$bqEncSql,
        |bassign AS (
        |  SELECT r.id, r.bucket, e.rv, e.bsum, e.nrm
        |  FROM ranked_assign r JOIN benc e ON r.id = e.id
        |  WHERE r.rn = 1 AND e.bsum > 0),
        |q AS (
        |  SELECT r.id AS q_id, b.rv AS q_rv, r.nrm AS q_nrm, r.bucket
        |  FROM ranked_assign r JOIN brot b ON r.id = b.id WHERE r.id < 8),
        |bq_scored AS (
        |  SELECT q.q_id, a.id AS n_id,
        |         ${bqEstSql("q.q_rv", "a.rv", "q.q_nrm", "a.bsum", "a.nrm")} AS score_c
        |  FROM q JOIN bassign a ON q.bucket = a.bucket AND q.q_id <> a.id),
        |short AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY score_c DESC, n_id ASC) AS rank
        |    FROM bq_scored) WHERE rank <= ${K * 4}),
        |rescored AS (
        |  SELECT s.q_id, s.n_id,
        |         ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} AS score_c
        |  FROM short s JOIN vn x ON s.q_id = x.id JOIN vn y ON s.n_id = y.id),
        |rr AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM rescored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM rr WHERE rank <= $K""".stripMargin,
    "knn_graph_ivfpq" ->
      s"""WITH $augmentedSql,
        |$vnSql,
        |${trainedAssignSql(s"($sqrtCellsSql)", nprobe = 2)},
        |${pqCodebookSql()},
        |$pqSelfKnnTailSql""".stripMargin,
    // The composed index: two-level assignment CTEs replace the flat
    // ranking, the PQ codebook + SDC tail are byte-identical to
    // knn_graph_ivfpq's — each half is proven elsewhere in isolation,
    // this row proves the composition.
    "knn_graph_ivf2pq" ->
      s"""WITH $augmentedSql,
        |$vnSql,
        |${trainedCentersSql(s"($sqrtCellsSql)")},
        |${twoLevelAssignSql(nprobe = 2)},
        |${pqCodebookSql()},
        |$pqSelfKnnTailSql""".stripMargin,
    // Graph two-stage: the IVFPQ code-space ranking keeps 4K per
    // query, the float cosine re-scores those rows, top-K re-ranks.
    "knn_graph_ivfpq_rerank" ->
      s"""WITH $augmentedSql,
        |$vnSql,
        |${trainedAssignSql(s"($sqrtCellsSql)", nprobe = 2)},
        |${pqCodebookSql()},
        |passign AS (
        |  SELECT r.id, r.bucket, rc.rvec, rc.rnrm
        |  FROM ranked_assign r JOIN prec rc ON r.id = rc.id WHERE r.rn = 1),
        |pprobe AS (
        |  SELECT r.id, r.bucket, rc.rvec, rc.rnrm
        |  FROM ranked_assign r JOIN prec rc ON r.id = rc.id),
        |pq_scored AS (
        |  SELECT p.id AS q_id, a.id AS n_id,
        |         ${pqScaledSql("p.rvec", "a.rvec", "p.rnrm", "a.rnrm")} AS score_c
        |  FROM pprobe p JOIN passign a
        |    ON p.bucket = a.bucket AND p.id <> a.id),
        |short AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |        ORDER BY score_c DESC, n_id ASC) AS rank
        |    FROM pq_scored) WHERE rank <= ${K * 4}),
        |rescored AS (
        |  SELECT s.q_id, s.n_id,
        |         ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} AS score_c
        |  FROM short s JOIN vn x ON s.q_id = x.id JOIN vn y ON s.n_id = y.id),
        |rr AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM rescored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM rr WHERE rank <= $K""".stripMargin,
    "knn_graph_srp" ->
      s"""WITH $augmentedSql,
        |$vnSql,
        |${srpBucketsSql(4, SrpPlanes)},
        |cand AS (
        |  SELECT DISTINCT a.id AS q_id, c.id AS n_id
        |  FROM bkt a JOIN bkt c
        |    ON a.band = c.band AND a.bkt = c.bkt AND a.id <> c.id
        |), scored AS (
        |  SELECT cand.q_id, cand.n_id,
        |         ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} AS score_c
        |  FROM cand JOIN vn x ON cand.q_id = x.id JOIN vn y ON cand.n_id = y.id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin,
    "knn_graph_srp_scaled" ->
      s"""WITH $augmentedSql,
        |$vnSql,
        |${srpBucketsSql(4, 10)},
        |cand AS (
        |  SELECT DISTINCT a.id AS q_id, c.id AS n_id
        |  FROM bkt a JOIN bkt c
        |    ON a.band = c.band AND a.bkt = c.bkt AND a.id <> c.id
        |), scored AS (
        |  SELECT cand.q_id, cand.n_id,
        |         ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} AS score_c
        |  FROM cand JOIN vn x ON cand.q_id = x.id JOIN vn y ON cand.n_id = y.id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin,
    "knn_graph_srp_auto" ->
      s"""WITH $augmentedSql,
        |$vnSql,
        |${srpBucketsAutoSql(4, 256L, 4)},
        |cand AS (
        |  SELECT DISTINCT a.id AS q_id, c.id AS n_id
        |  FROM bkt a JOIN bkt c
        |    ON a.band = c.band AND a.bkt = c.bkt AND a.id <> c.id
        |), scored AS (
        |  SELECT cand.q_id, cand.n_id,
        |         ${scaledPartsSql("x.vec", "y.vec", "x.nrm", "y.nrm")} AS score_c
        |  FROM cand JOIN vn x ON cand.q_id = x.id JOIN vn y ON cand.n_id = y.id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin
  )
}
