package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * TIMEOUT-SURVIVABLE by construction (round-17 post-mortem: the driver
  * SIGKILLed a contended run mid-dump; the manifest was only written at
  * the end, so CORRECTNESS_r17 recorded `{}` despite 180+ finished
  * parquet dumps). Three guarantees now hold at every instant of a run:
  *  1. a valid manifest exists from the FIRST instants of the process —
  *    it is bootstrapped (atomically) right after `mkdirs()`, BEFORE the
  *    Spark session is even constructed, so a kill during JVM/Spark
  *    startup (the round-18 diagnosis: driver-host contention during
  *    compile/startup) leaves `{}` — "started, certified nothing yet" —
  *    which is distinguishable from "never ran" (no file at all);
  *  2. the manifest on disk is VALID JSON covering exactly the queries
  *     whose parquet dump has landed (updated after each dump via
  *     write-temp + atomic rename — a kill can lose at most the dumps
  *     in flight, never corrupt or zero the manifest), and every landed
  *     dump prints one short stdout line (`[verify] k/N name ok`) so a
  *     truncated-stdout tail still shows exactly how far the run got;
  *  3. dumps run CHEAPEST-FIRST by the canon sf0.1 minima
  *     ([[QueryCosts]]), so a truncated run certifies the maximum
  *     number of queries (unmeasured queries sort mid-pack at the
  *     conservative default; streaming rows are expensive and land
  *     last on their own).
  * The invariants are machine-checked every round by HarnessSpec. */
object Verify {
  /** env first, then JVM system property — the property fallback exists
    * so in-process tests (HarnessSpec) can exercise subset/abort paths
    * without forking a JVM just to set environment variables. */
  private def opt(name: String): Option[String] =
    sys.env.get(name).orElse(sys.props.get(name))

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    new java.io.File(outDir).mkdirs()
    // Optional subset (comma-separated names) for LOCAL iteration on a
    // few queries — the driver never sets it, so the contract (dump
    // everything) is unchanged in driver runs.
    val subset = opt("SPARK_GRAFT_VERIFY_QUERIES")
    val selected = subset match {
      case None => SparkEntry.queries
      case Some(csv) =>
        val names = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = names -- SparkEntry.queries.keySet
        require(unknown.isEmpty, s"unknown queries: $unknown")
        SparkEntry.queries.view.filterKeys(names).toMap
    }
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
    val manifestPath = Paths.get(s"$outDir/oracle_sql.json")
    // A SUBSET run merges its entries over any manifest already in
    // outDir instead of replacing it: before round 14 a local
    // `SPARK_GRAFT_VERIFY_QUERIES=a,b` iteration overwrote the full
    // oracle_sql.json with a two-entry file, silently shrinking what a
    // later selfcheck.py pass in the same dir would verify. Driver
    // runs (no subset) still build the manifest fresh. Prior entries
    // are kept only for queries that still exist in the current build,
    // with their SQL refreshed from the current SparkEntry.oracleSql
    // (a renamed/removed query, or SQL edited since the prior dump,
    // must not persist stale), and only where the parquet dir is
    // actually present (a prior failed dump, or a hand-deleted dir,
    // must not leave a dangling manifest row).
    val base: Map[String, String] =
      if (subset.isDefined && Files.exists(manifestPath)) {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val prior = om.readValue(manifestPath.toFile,
          classOf[java.util.Map[String, String]])
        import scala.jdk.CollectionConverters._
        prior.asScala.toMap.view
          .filterKeys(SparkEntry.queries.keySet)
          .filterKeys(k => Files.isDirectory(Paths.get(s"$outDir/$k")))
          .toMap
          .map { case (k, v) => k -> SparkEntry.oracleSql.getOrElse(k, v) }
      } else Map.empty
    // Atomic manifest refresh: temp file + rename, so a kill at any
    // instant leaves either the previous or the new complete manifest,
    // never a torn write.
    def writeManifest(dumped: Set[String]): Unit = {
      val entries = base ++
        SparkEntry.oracleSql.view.filterKeys(dumped).toMap
      val json = entries
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      val tmp = Paths.get(s"$outDir/oracle_sql.json.tmp")
      Files.writeString(tmp, json)
      Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    // BOOTSTRAP (guarantee 1): land a valid manifest — empty on a full
    // run, the prior merged entries on a subset run — before the Spark
    // session (JVM-heavy, seconds under driver-host contention) is
    // built. A kill anywhere in startup now leaves machine-readable
    // evidence that Verify started. Never touches a session.
    writeManifest(Set.empty)
    println(s"[verify] manifest bootstrapped at $manifestPath " +
      s"(${base.size} prior entries, ${selected.size} queries selected); " +
      "building Spark session")
    System.out.flush()
    // Test hook (HarnessSpec): prove the bootstrap needs no session by
    // returning before one is constructed. Never set by the driver.
    if (opt("SPARK_GRAFT_VERIFY_BOOTSTRAP_ONLY").contains("1")) return
    val cpus = opt("SPARK_GRAFT_CPUS").getOrElse("4")
    val spark = GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Test hook (HarnessSpec): stop dumping after N successes — the
    // in-process stand-in for a driver SIGKILL mid-run. Never set by
    // the driver. Forces serial execution so "after N" is exact.
    val abortAfter =
      opt("SPARK_GRAFT_VERIFY_ABORT_AFTER").map(_.toInt).getOrElse(Int.MaxValue)
    // Concurrent dumps: most per-query wall-clock at verify scale is
    // driver-side analysis/optimization (single-threaded per query),
    // so a few parallel dumps overlap planning with execution and cut
    // the full-registry run well below the driver's timeout. Safe by
    // inspection: registry queries share no mutable session state
    // (temp-view names are per-query, streaming memory sinks are named
    // by the query, no query writes outside its own outDir/<name>), and
    // the manifest update is serialized below. Dumps are SUBMITTED
    // cheapest-first, so the certified-under-truncation guarantee keeps
    // its shape (a kill can lose at most the `par` dumps in flight).
    // Default 8 on ≥16-CPU hosts (halves the dump phase vs 4 — measured
    // round 18: 172 s at par=4 on 32 CPUs), 4 on smaller hosts.
    val par = (if (abortAfter != Int.MaxValue) 1
               else opt("SPARK_GRAFT_VERIFY_PARALLEL").map(_.toInt).getOrElse(
                 if (Runtime.getRuntime.availableProcessors >= 16) 8 else 4))
      .max(1)
    val ordered = selected.toSeq.sortBy { case (name, _) =>
      (QueryCosts.costOf(name), name)
    }
    val lock = new Object
    var dumped = Set.empty[String]
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    ordered.foreach { case (name, fn) =>
      pool.execute { () =>
        if (lock.synchronized(dumped.size) < abortAfter) {
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            lock.synchronized {
              dumped += name
              writeManifest(dumped)
              // Guarantee 2: one short line per landed dump, so the
              // driver's truncated stdout tail shows live progress and
              // a kill's exact position.
              println(s"[verify] ${dumped.size}/${ordered.size} $name ok")
              System.out.flush()
            }
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      }
    }
    pool.shutdown()
    pool.awaitTermination(Long.MaxValue, java.util.concurrent.TimeUnit.SECONDS)
    // Final write even if nothing dumped (e.g. every query failed):
    // the driver must find a valid (possibly empty) manifest, and a
    // subset run must still merge its base entries.
    lock.synchronized(writeManifest(dumped))
    println(s"[verify] done: ${dumped.size}/${ordered.size} dumped")
    System.out.flush()
    // Test hook: HarnessSpec runs main() in-process against the shared
    // suite session, which must survive the call.
    if (!opt("SPARK_GRAFT_KEEP_SESSION").contains("1")) spark.stop()
  }
}
