package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.jobs.{Job, ReferenceJobs}
import graft.sources.Jdbc

/** Per-job spark-submit entry point — the reference's operational
  * surface (one `main` per job wired to conf-key connections,
  * `Load CT Patients Job/.../LoadCTPatients.java:27-56`), collapsed to
  * ONE main parameterized by the catalog key: the 52-job catalog is
  * data ([[ReferenceJobs.antiJoinKeys]]), so the per-job binary the
  * reference rebuilds 52 times is here a CLI argument.
  *
  * Usage:
  * {{{
  * RunJob <catalogKey>
  *   --source-parquet <path>           | --source-jdbc <url> <user> <password> <table>
  *   --target-parquet <path>           | --target-jdbc <url> <user> <password> <table>
  *   [--jdbc-driver <class>]           (default: SQL Server's)
  *   [--write-partitions <n>]          (JDBC sink connection bound, default 50)
  * }}}
  *
  * Runs the complete incremental cycle for the key's [[graft.jobs.JobSpec]]
  * (clean → anti-join identity → PII hash → append; the generic spec
  * carries the job's complete identity + PII catalog) and prints one
  * JSON result line `{"job":...,"appended":N}`. Exercised end-to-end
  * against embedded Derby by `RunJobSpec`. */
object RunJob {

  private val Usage =
    "usage: RunJob <catalogKey> " +
      "(--source-parquet <path> | --source-jdbc <url> <user> <pass> <table>) " +
      "(--target-parquet <path> | --target-jdbc <url> <user> <pass> <table>) " +
      "[--jdbc-driver <class>] [--write-partitions <n>]"

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, Usage)
    val key = args(0)
    require(ReferenceJobs.antiJoinKeys.contains(key),
      s"unknown catalog key '$key'; known: " +
        ReferenceJobs.antiJoinKeys.keys.toSeq.sorted.mkString(", "))

    // Tiny positional flag parser — each flag consumes a fixed arity.
    val arity = Map("--source-parquet" -> 1, "--source-jdbc" -> 4,
      "--target-parquet" -> 1, "--target-jdbc" -> 4,
      "--jdbc-driver" -> 1, "--write-partitions" -> 1,
      "--create-target" -> 0)
    val opts = scala.collection.mutable.Map.empty[String, Seq[String]]
    var i = 1
    while (i < args.length) {
      val flag = args(i)
      val n = arity.getOrElse(flag,
        throw new IllegalArgumentException(s"unknown flag $flag\n$Usage"))
      require(i + n < args.length, s"$flag needs $n value(s)\n$Usage")
      opts(flag) = args.slice(i + 1, i + 1 + n).toSeq
      i += 1 + n
    }
    val driver = opts.get("--jdbc-driver").map(_.head)
      .getOrElse("com.microsoft.sqlserver.jdbc.SQLServerDriver")
    val writeParts = opts.get("--write-partitions").map(_.head.toInt)
      .getOrElse(50)

    def jdbcConn(v: Seq[String]) =
      (Jdbc.Conn(v(0), v(1), v(2), driver), v(3))

    // Reuse a live session when embedded (RunJobSpec drives main()
    // inside a test JVM); own-and-stop only a session this main built.
    val preexisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = graft.GraftSession.configure(
      SparkSession.builder(), sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val spec = ReferenceJobs.genericSpec(key)
      val source: DataFrame =
        (opts.get("--source-parquet"), opts.get("--source-jdbc")) match {
          case (Some(Seq(p)), None) => spark.read.parquet(p)
          case (None, Some(v)) =>
            val (c, t) = jdbcConn(v); Jdbc.tableScan(spark, c, t)
          case _ => throw new IllegalArgumentException(
            s"exactly one of --source-parquet/--source-jdbc required\n$Usage")
        }
      val appended: Long =
        (opts.get("--target-parquet"), opts.get("--target-jdbc")) match {
          case (Some(Seq(p)), None) =>
            Job.load(spark, source, p, spec)
          case (None, Some(v)) =>
            val (c, t) = jdbcConn(v)
            // First-run bootstrap (the reference's hand-maintained DDL
            // script, derived from the engine's own output schema):
            // create the target when asked and absent, so run 1 and
            // run N are the same command.
            if (opts.contains("--create-target")) {
              val shape = Job.run(source, spark.createDataFrame(
                  new java.util.ArrayList[org.apache.spark.sql.Row](),
                  Job.transform(source, spec).schema), spec)
              val dialect =
                if (driver.toLowerCase.contains("derby")) "derby"
                else "sqlserver"
              graft.sources.Ddl.ensureTable(c, t, shape.schema, dialect)
            }
            val fresh = Job.run(source, Jdbc.tableScan(spark, c, t), spec)
              .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
            try {
              val n = fresh.count()
              Jdbc.append(fresh, c, t, writeParts)
              n
            } finally { fresh.unpersist(); () }
          case _ => throw new IllegalArgumentException(
            s"exactly one of --target-parquet/--target-jdbc required\n$Usage")
        }
      // Single machine-readable result line (the count the reference
      // logs per job, LoadCTPatients.java:170).
      println(s"""{"job":"$key","appended":$appended}""")
    } finally if (!preexisting) spark.stop()
  }
}
