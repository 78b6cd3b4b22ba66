package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the executed plan of one registered query plus its
  * Exchange/ReusedExchange counts — the one-command version of the
  * `.explain("formatted")` loop the plan audits automate.
  *
  * Usage: runMain graft.tools.PlanPeek <sfDir> <name>
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PlanPeek <sfDir> <name>")
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[8]"), "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    // Materialize THIS QueryExecution first: with AQE, exchange reuse
    // happens at runtime stage scheduling — only the post-execution
    // adaptive plan shows which exchanges actually ran vs were served
    // from a reused stage. (A write/count would build a fresh
    // QueryExecution and leave this one unexecuted.)
    val qe = df.queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.treeString
    val ex = "(?<!Reused)Exchange".r.findAllIn(plan).length
    val reuse = "(ReusedExchange|StageReuse|reuses)".r.findAllIn(plan).length
    println(s"EXCHANGES=$ex REUSED=$reuse")
    println(plan)
    spark.stop()
  }
}
