package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-isolating companion to [[AbSrp]]: times ONLY the
  * srpBuckets materialization (noop write of the bucketing scan,
  * no pair join, no distinct) for both physical forms, plus reports
  * the corpus scan's partition count — separates "the heavy-array
  * projection stage is slow / under-parallel" from "downstream
  * changed".
  *
  * Usage: runMain graft.tools.AbSrpScan <sfDir> [passes]
  */
object AbSrpScan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AbSrpScan <sfDir> [passes]")
    val sfDir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[32]"), "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.SimQueries
    import graft.sim.Similarity

    val v = SimQueries.augmentedVectors(spark, sfDir)
    val n = v.count()
    val planes = Similarity.planesFor(n)
    println(s"""{"n":$n,"planes":$planes,"corpusPartitions":${v.rdd.getNumPartitions}}""")

    def time(op: Boolean): Double = {
      val t0 = System.nanoTime()
      Similarity.srpBuckets(v, 64, 4, planes, "srp", onePass = op)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (op <- Seq(true, false)) time(op) // codegen warm-up
    for (pass <- 1 to passes; op <- Seq(true, false)) {
      val t = time(op)
      println(f"""{"pass":$pass,"onePass":$op,"bucketScanOnly":$t%.3f}""")
    }
    spark.stop()
  }
}
