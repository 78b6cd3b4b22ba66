package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved in-JVM A/B of the two [[graft.sim.Similarity.srpBuckets]]
  * physical forms (one-pass posexplode vs per-band union scans) on the
  * SAME session, alternating forms within every pass so host-state
  * drift inflates both arms equally. A fixed small drift-control query
  * (`pricing_summary` at sf0.1) runs before every timed cell; if the
  * control drifts, the cell times are not comparable across passes —
  * but the WITHIN-pass A/B contrast still is.
  *
  * The form is a threaded `onePass` parameter (not a global knob), so
  * only the SRP graph queries — the ones whose physical form the A/B
  * actually varies — are runnable here.
  *
  * Usage: runMain graft.tools.AbSrp <sfDir> [passes] [query]
  */
object AbSrp {
  /** The op-parameterized SRP query surface (same bodies as the
    * registered queries; `onePass = true` IS the registered form). */
  private val srpQueries
      : Map[String, (SparkSession, String, Boolean) => DataFrame] = Map(
    "knn_graph_srp" -> (graft.queries.SimQueries.knnGraphSrpOp _),
    "knn_graph_srp_scaled" -> (graft.queries.SimQueries.knnGraphSrpScaledOp _),
    "knn_graph_srp_auto" -> (graft.queries.SimQueries.knnGraphSrpAutoOp _))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AbSrp <sfDir> [passes] [query]")
    val sfDir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val query = if (args.length > 2) args(2) else "knn_graph_srp_auto"
    require(srpQueries.contains(query),
      s"AbSrp benches the SRP graph queries only: ${srpQueries.keySet}")
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[32]"), "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOp(op: Boolean, dir: String): Double = {
      val t0 = System.nanoTime()
      srpQueries(query)(spark, dir, op)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def runControl(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("pricing_summary")(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Warm-up: both forms once at smoke scale (codegen compilation).
    for (op <- Seq(true, false)) runOp(op, "/root/testdata/sf0.001")
    val results = scala.collection.mutable.Map[Boolean,
      scala.collection.mutable.ArrayBuffer[Double]]()
      .withDefault(_ => scala.collection.mutable.ArrayBuffer[Double]())
    for (pass <- 1 to passes; op <- Seq(true, false)) {
      val drift = runControl()
      val t = runOp(op, sfDir)
      val buf = results.getOrElseUpdate(op,
        scala.collection.mutable.ArrayBuffer[Double]())
      buf += t
      println(f"""{"pass":$pass,"onePass":$op,"drift":$drift%.3f,"$query":$t%.3f}""")
    }
    def mn(op: Boolean) = results(op).min
    println(f"""{"summary":"$query","sf":"$sfDir","onePass_min":${mn(true)}%.3f,"union_min":${mn(false)}%.3f,"ratio_onePass_over_union":${mn(true) / mn(false)}%.3f}""")
    spark.stop()
  }
}
