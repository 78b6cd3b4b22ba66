package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for any registered query (not part of the library
  * surface). Usage:
  *
  *   runMain graft.tools.Prof <query> [sfDir] [runs] [--plan]
  *
  * Warm-runs the query once at sf0.001 (codegen + class-load), then
  * times `runs` noop-format writes at `sfDir` and prints the min —
  * the same measurement discipline as [[graft.Bench]]. `--plan` also
  * prints the executed plan's exchange/scan/window/join skeleton.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Prof <query> [sfDir] [runs] [--plan]"))
    val dir = args.drop(1).filterNot(_.startsWith("--")).headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(2).filterNot(_.startsWith("--")).headOption.map(_.toInt).getOrElse(3)
    val showPlan = args.contains("--plan")
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[32]"), "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(name)
    def noop(d: String): Unit =
      q(spark, d).write.format("noop").mode("overwrite").save()
    noop("/root/testdata/sf0.001")
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); noop(dir); (System.nanoTime() - t0) / 1e9
    }
    println(f"[prof] $name min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    if (showPlan) {
      val plan = q(spark, dir).queryExecution.executedPlan.toString
      println(plan.linesIterator
        .filter(l => Seq("Exchange", "Scan parquet", "Window", "Join",
          "Aggregate", "Generate", "WholeStageCodegen", "Project")
          .exists(l.contains))
        .map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
