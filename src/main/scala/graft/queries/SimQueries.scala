package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.{KMeans, Similarity}

/** Oracle-checked ANN queries over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
  *
  * Scores are double-precision cosine computed as an explicit ordered
  * left-fold on both sides (see [[graft.sim.Similarity]]) and scaled to
  * integer millionths, so ranks and scores hash-match the DuckDB
  * oracle exactly.
  */
object SimQueries {

  private val K = 3

  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Brute-force exact top-k (the correctness baseline; queries are the
    * vec_id < 8 slice, broadcast against the corpus). */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    Similarity.bruteForceTopK(v.filter(col("id") < 8), v, K)
  }

  /** IVF-bucketed top-k: centroids are the vec_id % 50 == 7 slice
    * (grows with the corpus), search restricted to the query's bucket. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    Similarity.ivfTopK(v.filter(col("id") < 8), v,
      v.filter(col("id") % 50 === 7), K)
  }

  /** Embedding-cosine near-duplicate pairs, blocked by IVF bucket:
    * vectors sharing a nearest-centroid bucket are pairwise scored and
    * kept when cosine >= 0.4 (the corpus has no true duplicates — the
    * operator shape is the point). Bucketed, never all-pairs. */
  def embeddingDedup(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val assigned = Similarity.assign(v, v.filter(col("id") % 50 === 7))
    val a = assigned.select(col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"), Similarity.norm(col("vec")).as("nrm_a"))
    val b = assigned.select(col("bucket").as("bucket_b"), col("id").as("id_b"),
      col("vec").as("vec_b"), Similarity.norm(col("vec")).as("nrm_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.scaledFromParts(Similarity.dot(col("vec_a"), col("vec_b")),
          col("nrm_a"), col("nrm_b")).as("score_c"))
      .filter(col("score_c") >= 400000L)
  }

  /** Embedding near-dup pairs over TRAINED cells: same operator shape
    * as [[embeddingDedup]] but the blocking cells come from
    * `KMeans.fitCenters` (fixed k, shuffle-free assignment) instead of
    * the corpus-slice centroids the DuckDB oracle can replay — the
    * production wiring, where |cells| is a user-chosen index parameter
    * rather than a function of corpus size. Rows-checked by the
    * driver; `SimilaritySpec` bounds its recall against brute-force
    * threshold pairs. */
  def embeddingDedupTrained(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val centers = KMeans.fitCenters(v, 0L until TrainedK.toLong, iters = 1)
    val assigned = Similarity.assignByCenters(v, centers)
      .repartition(col("bucket"))
    val a = assigned.select(col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"), Similarity.norm(col("vec")).as("nrm_a"))
    val b = assigned.select(col("bucket").as("bucket_b"), col("id").as("id_b"),
      col("vec").as("vec_b"), Similarity.norm(col("vec")).as("nrm_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.scaledFromParts(Similarity.dot(col("vec_a"), col("vec_b")),
          col("nrm_a"), col("nrm_b")).as("score_c"))
      .filter(col("score_c") >= 400000L)
  }

  /** Multi-probe IVF: the query fans out to its 2 nearest centroid
    * cells — the recall knob of a real IVF index (corpus side stays
    * single-assigned, so probes scale only the tiny query side). */
  def annIvfProbe2(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    Similarity.ivfTopK(v.filter(col("id") < 8), v,
      v.filter(col("id") % 50 === 7), K, nprobe = 2)
  }

  /** Fixed centroid count for the TRAINED IVF path — a user-chosen
    * index parameter (k ~ sqrt(n) at the bench scale), independent of
    * corpus size. Contrast with the `% 50` slice above, whose centroid
    * count grows linearly with the corpus and makes assignment
    * O(n^2/50) — kept only because DuckDB can replay it for the
    * hash-checked oracle; the trained path is the one a real pipeline
    * runs. */
  private val TrainedK = 32

  /** Augmented kNN corpus (×4): every embedding plus its rotations by
    * 16, 32 and 48 positions (`concat(vec[17..64], vec[1..16])` etc. —
    * norm-preserving, genuinely different directions, pure builtins so
    * DuckDB replays them exactly). The kNN-graph pair runs on this: at
    * the raw sf0.1 row count the brute pass's whole O(n²) fits in one
    * cheap job and per-job overhead hides the IVF asymptotics;
    * quadrupling n grows the brute pair count 16× while the IVF side
    * only quadruples, which is exactly the scaling story the pair
    * exists to demonstrate. */
  private def augmentedVectors(spark: SparkSession, dir: String): DataFrame = {
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
    * classic IVF sizing k ≈ √n (deterministic — seeded from the first
    * k corpus rows, exact integer-sum means; the √n count costs one
    * tiny job and keeps the cell population ~√n at EVERY scale, where
    * a fixed k degenerates to linear in-cell scans as the corpus
    * grows), then per-cell search with 2 probes.
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
    * a shuffle to every k-means scan of this small-file input.
    *
    * No SQL oracle: DuckDB cannot replay the iterative k-means;
    * correctness is covered by the driver's rows check plus
    * SimilaritySpec's recall-vs-brute-force bound. */
  def knnGraphIvf(spark: SparkSession, dir: String): DataFrame = {
    val v = augmentedVectors(spark, dir)
    val cells = math.max(8L, math.sqrt(v.count().toDouble).round)
    val centers = KMeans.fitCenters(v, 0L until cells, iters = 1)
    Similarity.knnGraphTopK(v, centers, K, nprobe = 2)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk"        -> (annTopK _),
    "ann_ivf"         -> (annIvf _),
    "ann_ivf_probe2"  -> (annIvfProbe2 _),
    "embedding_dedup" -> (embeddingDedup _),
    "embedding_dedup_trained" -> (embeddingDedupTrained _),
    "knn_graph_brute" -> (knnGraphBrute _),
    "knn_graph_ivf"   -> (knnGraphIvf _)
  )

  // ---------------------------------------------------------------- oracles

  /** DuckDB double-precision left-fold dot product of list exprs. */
  private def dotSql(a: String, b: String) =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  private def cosScaledSql(a: String, b: String) =
    s"""CAST(floor(${dotSql(a, b)} /
       |  (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) * 1e6 + 0.5) AS BIGINT)""".stripMargin

  val oracles: Map[String, String] = Map(
    "knn_graph_brute" ->
      s"""WITH v0 AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |v AS (SELECT id * 4 AS id, vec FROM v0
        |      UNION ALL SELECT id * 4 + 1, vec[17:64] || vec[1:16] FROM v0
        |      UNION ALL SELECT id * 4 + 2, vec[33:64] || vec[1:32] FROM v0
        |      UNION ALL SELECT id * 4 + 3, vec[49:64] || vec[1:48] FROM v0),
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
    "embedding_dedup" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |c AS (SELECT id AS c_id, vec AS c_vec FROM v WHERE id % 50 = 7),
        |assign AS (
        |  SELECT id, vec, c_id AS bucket FROM (
        |    SELECT v.id, v.vec, c.c_id,
        |           row_number() OVER (PARTITION BY v.id
        |             ORDER BY ${cosScaledSql("v.vec", "c.c_vec")} DESC, c.c_id ASC) AS rn
        |    FROM v CROSS JOIN c) WHERE rn = 1
        |)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       ${cosScaledSql("a.vec", "b.vec")} AS score_c
        |FROM assign a JOIN assign b ON a.bucket = b.bucket AND a.id < b.id
        |WHERE ${cosScaledSql("a.vec", "b.vec")} >= 400000""".stripMargin,
    "ann_ivf_probe2" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |c AS (SELECT id AS c_id, vec AS c_vec FROM v WHERE id % 50 = 7),
        |ranked_assign AS (
        |  SELECT v.id, v.vec, c.c_id AS bucket,
        |         row_number() OVER (PARTITION BY v.id
        |           ORDER BY ${cosScaledSql("v.vec", "c.c_vec")} DESC, c.c_id ASC) AS rn
        |  FROM v CROSS JOIN c
        |), assign AS (
        |  SELECT id, vec, bucket FROM ranked_assign WHERE rn = 1
        |), q AS (
        |  SELECT id AS q_id, vec AS q_vec, bucket
        |  FROM ranked_assign WHERE id < 8 AND rn <= 2
        |), scored AS (
        |  SELECT q.q_id, a.id AS n_id, ${cosScaledSql("q.q_vec", "a.vec")} AS score_c
        |  FROM q JOIN assign a ON q.bucket = a.bucket AND q.q_id <> a.id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin,
    "ann_ivf" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |c AS (SELECT id AS c_id, vec AS c_vec FROM v WHERE id % 50 = 7),
        |assign AS (
        |  SELECT id, vec, c_id AS bucket FROM (
        |    SELECT v.id, v.vec, c.c_id,
        |           row_number() OVER (PARTITION BY v.id
        |             ORDER BY ${cosScaledSql("v.vec", "c.c_vec")} DESC, c.c_id ASC) AS rn
        |    FROM v CROSS JOIN c) WHERE rn = 1
        |), q AS (
        |  SELECT id AS q_id, vec AS q_vec, bucket FROM assign WHERE id < 8
        |), scored AS (
        |  SELECT q.q_id, a.id AS n_id, ${cosScaledSql("q.q_vec", "a.vec")} AS score_c
        |  FROM q JOIN assign a ON q.bucket = a.bucket AND q.q_id <> a.id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_c DESC, n_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, n_id, score_c
        |FROM ranked WHERE rank <= $K""".stripMargin
  )
}
