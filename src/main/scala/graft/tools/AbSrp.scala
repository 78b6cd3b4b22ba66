package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved in-JVM A/B of the two [[graft.sim.Similarity.srpBuckets]]
  * physical forms (one-pass posexplode vs per-band union scans) on the
  * SAME session, alternating forms within every pass so host-state
  * drift inflates both arms equally. A fixed small drift-control query
  * (`pricing_summary` at sf0.1) runs before every timed cell; if the
  * control drifts, the cell times are not comparable across passes —
  * but the WITHIN-pass A/B contrast still is.
  *
  * Usage: runMain graft.tools.AbSrp <sfDir> [passes] [query]
  */
object AbSrp {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AbSrp <sfDir> [passes] [query]")
    val sfDir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val query = if (args.length > 2) args(2) else "knn_graph_srp_auto"
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[32]"), "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Warm-up: both forms once at smoke scale (codegen compilation).
    for (op <- Seq(true, false)) {
      graft.sim.Similarity.srpOnePass = op
      run(query, "/root/testdata/sf0.001")
    }
    val results = scala.collection.mutable.Map[Boolean,
      scala.collection.mutable.ArrayBuffer[Double]]()
      .withDefault(_ => scala.collection.mutable.ArrayBuffer[Double]())
    for (pass <- 1 to passes; op <- Seq(true, false)) {
      graft.sim.Similarity.srpOnePass = op
      val drift = run("pricing_summary", "/root/testdata/sf0.1")
      val t = run(query, sfDir)
      val buf = results.getOrElseUpdate(op,
        scala.collection.mutable.ArrayBuffer[Double]())
      buf += t
      println(f"""{"pass":$pass,"onePass":$op,"drift":$drift%.3f,"$query":$t%.3f}""")
    }
    graft.sim.Similarity.srpOnePass = true // restore production default
    def mn(op: Boolean) = results(op).min
    println(f"""{"summary":"$query","sf":"$sfDir","onePass_min":${mn(true)}%.3f,"union_min":${mn(false)}%.3f,"ratio_onePass_over_union":${mn(true) / mn(false)}%.3f}""")
    spark.stop()
  }
}
