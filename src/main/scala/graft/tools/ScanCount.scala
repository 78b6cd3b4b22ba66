package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec

/** Static scan-count audit over every registered query: how many times
  * does each query's plan scan each parquet table? Queries scanning one
  * table 3+ times are candidates for the shared-exchange treatment
  * (SCALE.md round-11c) — or have a declared eager-scalar reason.
  * Static plan only (no execution), so runtime exchange reuse is NOT
  * reflected; a reused subtree still counts one scan per reference.
  * Pair with PlanPeek (post-execution REUSED count) before concluding
  * anything about actual work.
  *
  * Usage: runMain graft.tools.ScanCount <sfDir> [minCount]
  */
object ScanCount {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScanCount <sfDir> [minCount]")
    val minCount = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[8]"), "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Streaming queries and eager-construction queries run real jobs
    // at build time; skip the stream harness rows (their cost model
    // is the stream, not the plan).
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, args(0))
        // Logical plan, not executedPlan: AdaptiveSparkPlanExec hides
        // its inner tree from collect().
        val scans = df.queryExecution.optimizedPlan.collect {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.headOption.map(_.getName).getOrElse("?")
              case other => other.getClass.getSimpleName
            }
        }
        val byTable = scans.groupBy(identity).view.mapValues(_.size)
          .filter(_._2 >= minCount).toMap
        if (byTable.nonEmpty)
          println(s"SCANS $name ${byTable.toSeq.sortBy(-_._2)
            .map { case (t, n) => s"$t:$n" }.mkString(" ")}")
      } catch {
        case e: Exception => println(s"ERR $name ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
