package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional subset (comma-separated names) for LOCAL iteration on a
    // few queries — the driver never sets it, so the contract (dump
    // everything) is unchanged in driver runs.
    val selected = sys.env.get("SPARK_GRAFT_VERIFY_QUERIES") match {
      case None => SparkEntry.queries
      case Some(csv) =>
        val names = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = names -- SparkEntry.queries.keySet
        require(unknown.isEmpty, s"unknown queries: $unknown")
        SparkEntry.queries.view.filterKeys(names).toMap
    }
    // Queries whose parquet dump actually landed: only these may claim a
    // manifest entry below — a dump that threw would otherwise leave a
    // manifest row pointing at a missing (or stale prior) parquet dir,
    // and a later selfcheck pass in the same outDir would "verify" it.
    val dumped: Set[String] = selected.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        Some(name)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        None
      }
    }.toSet
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // A SUBSET run merges its entries over any manifest already in
    // outDir instead of replacing it: before round 14 a local
    // `SPARK_GRAFT_VERIFY_QUERIES=a,b` iteration overwrote the full
    // oracle_sql.json with a two-entry file, silently shrinking what a
    // later selfcheck.py pass in the same dir would verify. Driver
    // runs (no subset) still write the complete manifest fresh.
    val fresh: Map[String, String] =
      SparkEntry.oracleSql.view.filterKeys(dumped).toMap
    val manifestPath = Paths.get(s"$outDir/oracle_sql.json")
    val merged: Map[String, String] =
      if (sys.env.contains("SPARK_GRAFT_VERIFY_QUERIES") &&
          Files.exists(manifestPath)) {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val prior = om.readValue(manifestPath.toFile,
          classOf[java.util.Map[String, String]])
        import scala.jdk.CollectionConverters._
        // Keep prior entries only for queries that still exist in the
        // current build, and refresh every surviving key's SQL from the
        // current SparkEntry.oracleSql: a renamed/removed query (or SQL
        // edited since the prior dump) would otherwise persist stale in
        // the manifest indefinitely and a later selfcheck pass could
        // verify against a query with no parquet output or outdated SQL.
        // ... and only for queries whose parquet dir is actually present
        // in this outDir (a prior failed dump, or a hand-deleted dir,
        // must not leave a dangling manifest row).
        val stillRegistered = prior.asScala.toMap.view
          .filterKeys(SparkEntry.queries.keySet)
          .filterKeys(k => Files.isDirectory(Paths.get(s"$outDir/$k")))
          .toMap
        val refreshed = stillRegistered.map { case (k, v) =>
          k -> SparkEntry.oracleSql.getOrElse(k, v)
        }
        refreshed ++ fresh
      } else fresh
    val json = merged
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(manifestPath, json)
    spark.stop()
  }
}
