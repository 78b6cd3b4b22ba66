package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.SimQueries
import graft.sim.{KMeans, Similarity}

/** Measured ANN retrieval QUALITY at scale — the half the speed soaks
  * don't cover: sample query vectors from the augmented kNN corpus,
  * compute their EXACT top-k (broadcast sample × corpus scan — the
  * sample is bytes, the corpus is never collected), run each
  * approximate kNN-graph variant, and report recall@k = |approx ∩
  * exact| / |exact| per variant.
  *
  * Usage: runMain graft.tools.RecallProbe <sfDir> [sampleStep=200] [k=10]
  *
  * Sampling is deterministic (id % step == 0) so runs are comparable
  * across rounds. Prints one JSON line; SCALE.md carries the sf1
  * table. The sf0.1 recall floor is additionally gated in
  * `RecallSpec`. */
object RecallProbe {

  /** recall@k of `approx` against `exact`, both (q_id, rank, n_id, …),
    * restricted to exact's query set. */
  def recallAt(exact: DataFrame, approx: DataFrame): Double = {
    val e = exact.select(col("q_id"), col("n_id"))
    val a = approx.select(col("q_id"), col("n_id"))
    val hit = e.join(a, Seq("q_id", "n_id"), "left_semi").count()
    val total = e.count()
    if (total == 0) 0.0 else hit.toDouble / total
  }

  /** The probe variants over a corpus: exact baseline + named
    * approximations, queries = the deterministic sample. */
  def probe(spark: SparkSession, dir: String, sampleStep: Long, k: Int)
      : (Long, Long, Seq[(String, Double)]) = {
    val corpus = SimQueries.augmentedVectors(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val n = corpus.count()
      val sample = corpus.filter(col("id") % sampleStep === 0)
      val nSample = sample.count()
      val exact = Similarity.bruteForceTopK(sample, corpus, k)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      try {
        val sqrtK = math.max(8L, math.sqrt(n.toDouble).round)
        val centers = KMeans.fitCenters(corpus, 0L until sqrtK, iters = 1)
        def sampled(df: DataFrame) = df.filter(col("q_id") % sampleStep === 0)
        val cb = graft.sim.Pq.fitCodebooks(corpus)
        val variants = Seq(
          "knn_graph_srp_scaled" ->
            Similarity.srpKnnGraph(corpus, 64, bands = 4, planes = 10, k = k),
          "knn_graph_srp_auto" ->
            Similarity.srpKnnGraph(corpus, 64, bands = 4,
              planes = Similarity.planesFor(n), k = k),
          "knn_graph_ivf_probe1" ->
            Similarity.knnGraphTopK(corpus, centers, k, nprobe = 1),
          "knn_graph_ivf_probe2" ->
            Similarity.knnGraphTopK(corpus, centers, k, nprobe = 2),
          // The ENGINE-CHOSEN probe count (knn_graph_probe_auto's
          // rule): nprobe from the measured occupancy histogram
          // against the two-mean-cells candidate target. On the
          // near-uniform trained histogram this must land on the
          // probe2 row's recall exactly; on a skewed one it trades
          // identically to the candidate volume it chose — either
          // way the recall row documents what the engine's choice
          // RETRIEVES at this scale.
          "knn_graph_probe_auto" ->
            Similarity.knnGraphTopK(corpus, centers, k,
              nprobe = Similarity.probeFor(corpus, centers)),
          // The compressed graph pair: plain SDC ranking (quantization
          // collapses in-cluster order — the measured recall price) vs
          // the two-stage cure (4k code-space shortlist, exact float
          // re-rank). Same centers/probes as the float rows above, so
          // the delta isolates the payload choice.
          "knn_graph_ivfpq" ->
            Similarity.knnGraphTopKPq(corpus, centers, cb, k, nprobe = 2),
          "knn_graph_ivfpq_rerank" ->
            Similarity.rerankExactGraph(
              Similarity.knnGraphTopKPq(corpus, centers, cb, k * 4,
                nprobe = 2), corpus, k))
        (n, nSample,
          variants.map { case (name, df) => name -> recallAt(exact, sampled(df)) })
      } finally { exact.unpersist(); () }
    } finally { corpus.unpersist(); () }
  }

  /** Deterministic CLUSTERED corpus at scale, derived from the sf
    * dir's embeddings: `nClusters` unit base vectors (vec_id <
    * nClusters) each expanded to `members` members by md5-derived
    * per-coordinate uniform noise (±0.05 on unit centers — in-cluster
    * cosine ≈ 0.95, cross-cluster ≈ 0: the RecallSpec clustered
    * geometry, scaled). Ids INTERLEAVE clusters (id % nClusters =
    * cluster id, exactly RecallSpec's `i % 40`), so the engine
    * k-means rule's dense 0..√n init rows span √n DISTINCT clusters
    * rather than the members of the first few. */
  def clusteredAtScale(spark: SparkSession, dir: String,
      nClusters: Int, members: Int): DataFrame = {
    val base = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < nClusters)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    graft.Tables.spread(base)
      .withColumn("m", explode(sequence(lit(0), lit(members - 1))))
      .select((col("m") * nClusters + col("cid")).as("id"),
        transform(col("cvec"), (x, i) => {
          val h = graft.text.TextFunctions.portableHash(
            concat_ws(":", col("cid").cast("string"),
              col("m").cast("string"), i.cast("string")), "rcnoise")
          (x.cast("double") +
            ((h % 2001L).cast("double") - lit(1000.0d)) / 1000.0d * 0.05d)
            .cast("float")
        }).as("vec"))
  }

  /** The sf10 recall row for the PROBE dispatcher (round-16 verdict
    * follow-up): on the clustered corpus at scale, exact truth over a
    * deterministic sample, then trained-IVF recall at nprobe 1, the
    * pinned production 2, and the ENGINE-CHOSEN count — the ≥0.8
    * contract RecallSpec gates at n=2000, measured at 800k. */
  def probeClustered(spark: SparkSession, dir: String, nClusters: Int,
      members: Int, sampleStep: Long, k: Int)
      : (Long, Long, Int, Seq[(String, Double)]) = {
    val corpus = clusteredAtScale(spark, dir, nClusters, members)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val n = corpus.count()
      val sample = corpus.filter(col("id") % sampleStep === 0)
      val nSample = sample.count()
      val exact = Similarity.bruteForceTopK(sample, corpus, k)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      try {
        val sqrtK = math.max(8L, math.sqrt(n.toDouble).round)
        val centers = KMeans.fitCenters(corpus, 0L until sqrtK, iters = 1)
        val pAuto = Similarity.probeFor(corpus, centers)
        def sampled(df: DataFrame) = df.filter(col("q_id") % sampleStep === 0)
        val variants = Seq(
          "knn_graph_ivf_probe1" ->
            Similarity.knnGraphTopK(corpus, centers, k, nprobe = 1),
          "knn_graph_ivf_probe2" ->
            Similarity.knnGraphTopK(corpus, centers, k, nprobe = 2),
          "knn_graph_probe_auto" ->
            Similarity.knnGraphTopK(corpus, centers, k, nprobe = pAuto))
        (n, nSample, pAuto,
          variants.map { case (name, df) => name -> recallAt(exact, sampled(df)) })
      } finally { exact.unpersist(); () }
    } finally { corpus.unpersist(); () }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: RecallProbe <sfDir> [sampleStep] [k] | " +
        "RecallProbe <sfDir> clustered [nClusters] [members] [sampleStep] [k]")
    val dir = args(0)
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[32]"), "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (args.length > 1 && args(1) == "clustered") {
        val nClusters = if (args.length > 2) args(2).toInt else 16000
        val members = if (args.length > 3) args(3).toInt else 50
        val step = if (args.length > 4) args(4).toLong else 2000L
        val k = if (args.length > 5) args(5).toInt else 10
        val (n, nSample, pAuto, rs) =
          probeClustered(spark, dir, nClusters, members, step, k)
        val vs = rs.map { case (name, r) =>
          "\"" + name + "\":" + f"$r%.4f" }.mkString("{", ",", "}")
        println(s"""{"metric":"recall@$k","mode":"clustered","sf":"$dir",""" +
          s""""corpus":$n,"sample":$nSample,"nprobe_auto":$pAuto,""" +
          s""""variants":$vs}""")
      } else {
        val step = if (args.length > 1) args(1).toLong else 200L
        val k = if (args.length > 2) args(2).toInt else 10
        val (n, nSample, rs) = probe(spark, dir, step, k)
        val vs = rs.map { case (name, r) =>
          "\"" + name + "\":" + f"$r%.4f" }.mkString("{", ",", "}")
        println(s"""{"metric":"recall@$k","sf":"$dir","corpus":$n,""" +
          s""""sample":$nSample,"variants":$vs}""")
      }
    } finally spark.stop()
  }
}
