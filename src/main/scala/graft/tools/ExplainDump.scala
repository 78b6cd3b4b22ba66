package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump `.explain("formatted")` of registered queries to files (dev tool).
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <name> [name...] */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <sfDir> <outDir> <name>...")
    val (dir, out) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    args.drop(2).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$name.txt"), txt)
      println(s"[explain] $name -> $out/$name.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
