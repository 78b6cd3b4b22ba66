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
  *
  * TIMEOUT-SURVIVABLE (round-17 post-mortem: the driver's bench run hit
  * its wall-clock limit mid-pass-2 and the single end-of-run write
  * discarded every completed measurement — BENCH_r17 recorded rc 124
  * and nothing else). Now:
  *  - after EVERY completed pass the full JSON line (minima over the
  *    passes completed so far, with a `"passes_completed"` field) is
  *    both printed to stdout and flushed to the output file — a
  *    pass-1-only artifact is still a valid bench, and a driver that
  *    takes the last parseable stdout line gets the newest snapshot;
  *  - each full line is FOLLOWED by a compact same-schema summary line
  *    (`"queries":{}`, `"compact":true` — ~200 bytes) so a driver that
  *    keeps only a small stdout tail (the ~12 KB full line has been
  *    truncated in every driver artifact since r14) still gets a
  *    parseable total/failed/sf as its tail's last line;
  *  - fixed wall-clock is cut where it buys nothing: the sf0.001
  *    warm-up (codegen compilation, 2-4 s per large plan) is skipped
  *    for queries whose canon minimum is under 0.5 s (their plans
  *    compile in less than the warm-up run costs), and passes 2-3
  *    re-measure ONLY the rows whose running minimum still exceeds
  *    1.15x their canon cost, or that failed. Min-of-3 exists to dodge
  *    host-noise windows; a row whose pass-1 time already matches its
  *    canonical steady state gains nothing from two more samples,
  *    while a burst-inflated (or genuinely regressed) row retries —
  *    and a real regression stays slow through all three passes, so
  *    it still reads as one. Clean-host full sweep: ~6 min (one pass
  *    plus a thin retry tail) vs ~14 under unconditional min-of-3;
  *    canonical re-pins force full min-of-3 via
  *    SPARK_GRAFT_BENCH_RETRY_FACTOR=0 (dedicated runs);
  *  - the canon hints are sf0.1-ONLY, so when SPARK_GRAFT_SF_DIR is
  *    not the canon scale the adaptive cuts default OFF (retry factor
  *    0 → full min-of-3; warm-up floor 0 → every row warms up) unless
  *    the envs override them — a sf0.01/sf0.001 smoke bench must not
  *    silently read every row as "matches canon" after one cold pass;
  *  - the emitted JSON records the protocol (`retry_factor`,
  *    `warmup_floor_sec`) so canon-source eligibility is machine-
  *    checkable: canon merges take rows only from retry_factor=0 runs
  *    or per-query minima (the warm-up-skip set is deterministic from
  *    the committed QueryCosts table and the emitted floor);
  *  - SPARK_GRAFT_BENCH_PASSES (1-3, default 3) degrades the pass
  *    count outright for budget-constrained sweeps.
  */
object Bench {
  /** Canon-minimum threshold for the warm-up cut. Queries the canon
    * has not measured get [[QueryCosts.default]] (1.0 s) and therefore
    * a full warm-up — conservative for new code. */
  private val WarmupFloorSec = 0.5

  /** env first, then JVM system property — the property fallback exists
    * so in-process tests (HarnessSpec) can exercise the subset / pass-
    * degradation / flush paths without forking a JVM to set env vars. */
  private def opt(name: String): Option[String] =
    sys.env.get(name).orElse(sys.props.get(name))

  def main(args: Array[String]): Unit = {
    val sfDir = opt("SPARK_GRAFT_SF_DIR").getOrElse("/root/testdata/sf0.1")
    val cpus = opt("SPARK_GRAFT_CPUS").getOrElse("32")
    val spark = GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional subset (comma-separated names in SPARK_GRAFT_QUERIES):
    // the at-scale soak benches the heavy queries without paying for
    // the full registry at every scale.
    val selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      opt("SPARK_GRAFT_QUERIES") match {
        case None => SparkEntry.queries
        case Some(csv) =>
          val names = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
          val unknown = names -- SparkEntry.queries.keySet
          require(unknown.isEmpty, s"unknown queries in SPARK_GRAFT_QUERIES: $unknown")
          SparkEntry.queries.view.filterKeys(names).toMap
      }
    val maxPasses = opt("SPARK_GRAFT_BENCH_PASSES")
      .map(_.toInt).getOrElse(3).max(1).min(3)
    // The canon minima are sf0.1 measurements; at any other scale they
    // say nothing about what a healthy row costs, so the adaptive cuts
    // (retry skip, warm-up skip) default OFF there (class doc).
    val canonScale = sfDir.replaceAll("/+$", "").endsWith("sf0.1")
    val retryFactor = opt("SPARK_GRAFT_BENCH_RETRY_FACTOR")
      .map(_.toDouble).getOrElse(if (canonScale) 1.15 else 0.0)
    val warmupFloor = opt("SPARK_GRAFT_BENCH_WARMUP_FLOOR")
      .map(_.toDouble).getOrElse(if (canonScale) WarmupFloorSec else 0.0)
    if (!canonScale)
      System.err.println(s"[bench] $sfDir is not the canon sf0.1 scale: " +
        "defaulting to full min-of-3 + full warm-up (canon hints are sf0.1-only)")
    // Warm-up: run each query once at the smallest scale so the
    // measured pass reflects steady-state throughput, not whole-stage
    // codegen compilation of each plan — but only for queries whose
    // canon minimum says the compilation matters (>= 0.5 s rows); the
    // sub-second tail's compile time is below the warm-up's own cost.
    selected.toSeq.sortBy(_._1)
      .filter { case (name, _) => QueryCosts.costOf(name) >= warmupFloor }
      .foreach { case (_, fn) =>
        try fn(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    // Min of up to three INTERLEAVED measured passes per query:
    // host-level CPU noise was observed to swing single measurements
    // 2-4x, in sustained windows long enough that three back-to-back
    // runs of the SAME query all land inside one window (round-4
    // recorded 5.5s for a query that steady-states at 0.8s despite
    // min-of-3). The suite therefore runs as pass 1 (all queries) ->
    // pass 2 -> pass 3, per-query min across passes: a noise window
    // now inflates one PASS of many queries, and each query's other
    // two passes — minutes apart — still record the steady state. The
    // minimum is the standard low-noise estimator of steady-state
    // runtime. A query that throws on every attempted pass records the
    // sentinel -1 (NOT its time-to-failure, which would read as a
    // healthy fast run) and is listed in "failed" so the JSON can't
    // mistake failure for speed. A row whose running minimum already
    // matches its canon cost stops re-running (adaptive retry, class
    // doc) — its passJson array is shorter than 3, which is how a
    // reader distinguishes "not re-run" from "failed" (-1).
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
    // Adaptive retry (see class doc): a row re-runs in passes 2-3 only
    // while its running minimum exceeds retryFactor x its canon cost
    // (floored at 0.15 s so sub-100 ms rows aren't retried over jitter)
    // or it has no successful measurement yet. 1.15 is the noise band
    // the canon compares tolerate; 0 forces full min-of-3 (dedicated
    // re-pin runs, and the default off the canon scale); a huge value
    // forces single-pass (HarnessSpec).
    def needsRetry(name: String, sofar: Seq[Map[String, Option[Double]]]): Boolean = {
      val ts = sofar.flatMap(_.get(name).flatten)
      ts.isEmpty ||
        ts.min > retryFactor * math.max(0.15, QueryCosts.costOf(name))
    }
    // Emit the full artifact from whatever passes have completed: the
    // per-pass time matrix lets a reader separate code deltas from
    // host-state drift (a noise window inflates one pass of MANY
    // queries at once — a correlated column; a real regression moves
    // all passes of ONE query). BASELINE_LOCAL.md records the
    // corresponding quiet-host steady-state table.
    def emit(passes: Seq[Map[String, Option[Double]]]): String = {
      val results = ordered.map { case (name, _) =>
        val ts = passes.flatMap(_.get(name).flatten)
        name -> (if (ts.isEmpty) -1.0 else ts.min)
      }
      val failed = results.collect { case (k, v) if v < 0 => k }
      val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val passJson = ordered.map { case (name, _) =>
        val ts = passes.collect { case p if p.contains(name) =>
          p(name).getOrElse(-1.0) }
        s"\"" + name + "\":" + ts.mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val total = results.map(_._2).filter(_ >= 0).sum
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passJson,"passes_completed":${passes.size},"failed":$failedJson,"retry_factor":$retryFactor,"warmup_floor_sec":$warmupFloor,"sf":"$sfDir"}"""
    }
    // Compact tail line (class doc): same schema, `"queries":{}` and no
    // per-pass matrix — small enough (~200 bytes) that it survives any
    // stdout-tail truncation window intact as the last line.
    def emitCompact(passes: Seq[Map[String, Option[Double]]]): String = {
      val results = ordered.map { case (name, _) =>
        val ts = passes.flatMap(_.get(name).flatten)
        if (ts.isEmpty) -1.0 else ts.min
      }
      val failed = ordered.zip(results)
        .collect { case ((k, _), v) if v < 0 => k }
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val total = results.filter(_ >= 0).sum
      s"""{"metric":"total","value":$total,"unit":"sec","queries":{},"compact":true,"n_queries":${ordered.size},"passes_completed":${passes.size},"failed":$failedJson,"retry_factor":$retryFactor,"warmup_floor_sec":$warmupFloor,"sf":"$sfDir"}"""
    }
    // Stdout capture has been observed truncated in the driver's
    // per-round artifact (r8/r9 tails, and the r11-r13 BENCH_r{N}
    // files all stored a ~2 KB tail with parsed:null) — so the line is
    // ALWAYS persisted to a file as well: SPARK_GRAFT_BENCH_OUT if
    // set, else BENCH_FULL_LATEST.json in the working directory.
    // Persistence is best-effort: the JSON line is already on stdout,
    // so a read-only cwd (or full disk) must not abort the run.
    val outPath = opt("SPARK_GRAFT_BENCH_OUT")
      .getOrElse("BENCH_FULL_LATEST.json")
    def flush(full: String, compact: String): Unit = {
      println(full)
      println(compact)
      System.out.flush()
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outPath), full + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not persist $outPath: ${e.getMessage}")
      }
    }
    // Test hook (HarnessSpec): stop after flushing pass N — the
    // in-process stand-in for a driver SIGKILL between passes (the
    // flushed artifact is byte-identical to what a kill would leave,
    // because each pass's flush has already atomically landed). Never
    // set by the driver.
    val abortAfterPass = opt("SPARK_GRAFT_BENCH_ABORT_AFTER_PASS")
      .map(_.toInt).getOrElse(Int.MaxValue)
    var passes = Seq.empty[Map[String, Option[Double]]]
    (1 to maxPasses).foreach { passNo =>
      val inPass = ordered.filter { case (name, _) =>
        passNo == 1 || needsRetry(name, passes) }
      if (inPass.nonEmpty && passes.size < abortAfterPass) {
        val pass = inPass.map { case (name, fn) => name -> timeOnce(name, fn) }.toMap
        passes :+= pass
        flush(emit(passes), emitCompact(passes))
      }
    }
    // Test hook: HarnessSpec runs main() in-process against the shared
    // suite session, which must survive the call.
    if (!opt("SPARK_GRAFT_KEEP_SESSION").contains("1")) spark.stop()
  }
}
