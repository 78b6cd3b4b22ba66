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

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RecallProbe <sfDir> [sampleStep] [k]")
    val dir = args(0)
    val step = if (args.length > 1) args(1).toLong else 200L
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[32]"), "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (n, nSample, rs) = probe(spark, dir, step, k)
      val vs = rs.map { case (name, r) =>
        "\"" + name + "\":" + f"$r%.4f" }.mkString("{", ",", "}")
      println(s"""{"metric":"recall@$k","sf":"$dir","corpus":$n,""" +
        s""""sample":$nSample,"variants":$vs}""")
    } finally spark.stop()
  }
}
