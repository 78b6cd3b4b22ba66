package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the executed plan of the srpBuckets frame under both
  * physical forms — companion to [[AbSrpScan]] for diagnosing where
  * the one-pass form's projection time goes (codegen spans, Generate
  * placement, expression duplication).
  *
  * Usage: runMain graft.tools.AbSrpPlan <sfDir>
  */
object AbSrpPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[8]"), "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.SimQueries
    import graft.sim.Similarity
    val v = SimQueries.augmentedVectors(spark, sfDir)
    for (op <- Seq(true, false)) {
      val df = Similarity.srpBuckets(v, 64, 4, 9, "srp", onePass = op)
      println(s"===== onePass=$op =====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
