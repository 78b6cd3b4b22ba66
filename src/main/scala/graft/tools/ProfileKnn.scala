package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.sim.{KMeans, Similarity}
import org.apache.spark.sql.functions._

/** Scratch profiler for the kNN-graph bench pair (not part of the
  * library surface): times k-means build vs search vs brute. */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[32]"), "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val v0 = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id0"), col("embedding").as("vec"))
    val v = v0.select((col("id0") * 2).as("id"), col("vec"))
      .unionByName(v0.select((col("id0") * 2 + 1).as("id"),
        concat(slice(col("vec"), 33, 32), slice(col("vec"), 1, 32)).as("vec")))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warm-up both full pipelines.
    noop(Similarity.bruteForceTopK(v, v, 3))
    val c0 = KMeans.fitCenters(v, 0L until 32L, 1)
    noop(Similarity.knnGraphTopK(v, c0, 3, 2))
    for (_ <- 1 to 2) {
      time("doubled count") { v.count() }
      val init = time("init collect") {
        v.filter(col("id") < 32).collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
      }
      val cs = time("one step") { KMeans.stepCenters(v, init) }
      println(s"[profile] centers after step: ${cs.length}")
      val sizes = time("cell sizes") {
        Similarity.assignByCenters(v, cs)
          .groupBy("bucket").count().collect().map(_.getLong(1)).sorted
      }
      println(s"[profile] cells=${sizes.length} min=${sizes.head} " +
        s"max=${sizes.last} sum2=${sizes.map(s => s * s).sum}")
      time("search only") { noop(Similarity.knnGraphTopK(v, cs, 3, 2)) }
      time("brute all") { noop(Similarity.bruteForceTopK(Tables.spread(v), Tables.spread(v), 3)) }
    }
    spark.stop()
  }
}
