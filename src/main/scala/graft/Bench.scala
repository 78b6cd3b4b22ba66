package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Materialization is a `noop`-format write: executes the full physical
  * plan on the executors (every projection, hash, and join actually
  * runs) without collecting to the driver and without letting Catalyst
  * rewrite the plan the way a `count()` action does (round-1 bench
  * under-measured projection-heavy queries for exactly that reason).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run every query once at the smallest scale so the
    // measured pass reflects steady-state throughput, not whole-stage
    // codegen compilation of each plan (profiled at 2-4s per large
    // plan on first execution, ~0 after).
    // Optional subset (comma-separated names in SPARK_GRAFT_QUERIES):
    // the at-scale soak benches the heavy queries without paying for
    // the full registry at every scale.
    val selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      sys.env.get("SPARK_GRAFT_QUERIES") match {
        case None => SparkEntry.queries
        case Some(csv) =>
          val names = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
          val unknown = names -- SparkEntry.queries.keySet
          require(unknown.isEmpty, s"unknown queries in SPARK_GRAFT_QUERIES: $unknown")
          SparkEntry.queries.view.filterKeys(names).toMap
      }
    selected.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Min of three INTERLEAVED measured passes per query: host-level
    // CPU noise was observed to swing single measurements 2-4x, in
    // sustained windows long enough that three back-to-back runs of
    // the SAME query all land inside one window (round-4 recorded 5.5s
    // for a query that steady-states at 0.8s despite min-of-3). The
    // suite therefore runs as pass 1 (all queries) -> pass 2 -> pass 3,
    // per-query min across passes: a noise window now inflates one
    // PASS of many queries, and each query's other two passes — minutes
    // apart — still record the steady state. The minimum is the
    // standard low-noise estimator of steady-state runtime. A query
    // that throws records the sentinel -1 (NOT its time-to-failure,
    // which would read as a healthy fast run) and is listed in
    // "failed" so the JSON can't mistake failure for speed.
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
    }
    val ordered = selected.toSeq.sortBy(_._1)
    val passes: Seq[Map[String, Option[Double]]] = (1 to 3).map { _ =>
      ordered.map { case (name, fn) => name -> timeOnce(name, fn) }.toMap
    }
    val results = ordered.map { case (name, _) =>
      val ts = passes.flatMap(_(name))
      name -> (if (ts.isEmpty) -1.0 else ts.min)
    }
    val failed = results.collect { case (k, v) if v < 0 => k }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // All three per-pass times per query (a failed pass records -1), so
    // a reader can separate code deltas from host-state drift: a noise
    // window inflates one pass of MANY queries at once, visible as a
    // correlated column in this matrix, while a real regression moves
    // all three passes of ONE query. BASELINE_LOCAL.md records the
    // corresponding quiet-host steady-state table.
    val passJson = ordered.map { case (name, _) =>
      val ts = passes.map(_(name).getOrElse(-1.0))
      s"\"" + name + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passJson,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // Stdout capture has been observed truncated in the driver's
    // per-round artifact (r8/r9 tails, and the r11-r13 BENCH_r{N}
    // files all stored a ~2 KB tail with parsed:null) — so the full
    // line is ALWAYS persisted to a file as well: SPARK_GRAFT_BENCH_OUT
    // if set, else BENCH_FULL_LATEST.json in the working directory.
    // Every sweep's complete per-query minima are therefore
    // artifact-traceable even when stdout is clipped.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "BENCH_FULL_LATEST.json")
    // Persistence is best-effort: the JSON line is already on stdout, so
    // a read-only cwd (or full disk) must not abort the exit path —
    // spark.stop() below still has to run.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
