package graft

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Machine-checks the harness's TIMEOUT-SURVIVABILITY contract — the
  * round-17 failure mode where a driver SIGKILL mid-run zeroed the
  * round's evidence (`CORRECTNESS_r17.json` = `{}`, `BENCH_r17` rc 124
  * with every completed measurement discarded) must be structurally
  * impossible:
  *
  *  - [[Verify]] bootstraps a valid (empty) manifest BEFORE the Spark
  *    session is constructed (a kill during JVM/Spark startup — the
  *    round-18 diagnosis — leaves `{}`, not nothing), writes
  *    `oracle_sql.json` incrementally (atomic temp+rename after EVERY
  *    successful dump), prints one progress line per landed dump,
  *    orders dumps cheapest-first by the canon minima ([[QueryCosts]]),
  *    and merges subset runs over the prior manifest;
  *  - [[Bench]] flushes a complete, parseable JSON artifact (with
  *    `passes_completed`, `retry_factor`, `warmup_floor_sec`) after
  *    EVERY measured pass, follows each full line with a compact
  *    tail-proof summary line, skips warm-up for sub-0.5s canon rows
  *    and re-measures in passes 2-3 only the rows whose running minimum
  *    still exceeds their canon cost (adaptive retry) — both cuts
  *    AT THE CANON sf0.1 SCALE ONLY (full min-of-3 + full warm-up
  *    elsewhere: the canon says nothing about other scales).
  *
  * A kill is simulated in-process via SPARK_GRAFT_VERIFY_ABORT_AFTER
  * (stop dumping after N successes — byte-identical manifest state to
  * a SIGKILL between dump N and N+1, because the manifest write for
  * dump N has already atomically landed). */
class HarnessSpec extends SparkSpec {

  private val om = new ObjectMapper()

  private def readManifest(dir: String): Map[String, String] =
    om.readValue(Paths.get(s"$dir/oracle_sql.json").toFile,
      classOf[java.util.Map[String, String]]).asScala.toMap

  /** Run a main() with the given system properties set (the mains read
    * env first, then props — the prop path exists for this spec), and
    * the shared suite session protected from the main's stop(). */
  private def withProps[A](props: Map[String, String])(body: => A): A =
    HarnessSpec.propLock.synchronized {
      val all = props + ("SPARK_GRAFT_KEEP_SESSION" -> "1")
      all.foreach { case (k, v) => sys.props(k) = v }
      try body
      finally all.keys.foreach(sys.props.remove)
    }

  // Fixture queries DERIVED from the live QueryCosts table so canon
  // re-pins cannot silently invalidate the spec's assumptions:
  //  - subset: the three cheapest canon rows (fast at sf0.001);
  //    byCost mirrors Verify's exact (cost, name) ordering.
  //  - onePassQ: the cheapest row; multiPassQ: a mid-cost row
  //    (0.35-0.7 s). Pass counts are forced per-test via the retry
  //    factor, so the only standing requirement is that both run fast
  //    at sf0.001.
  private val subset = SparkEntry.queries.keySet.toSeq
    .filter(QueryCosts.sf01Min.contains)
    .sortBy(q => (QueryCosts.costOf(q), q)).take(3)
  private val byCost = subset.sortBy(q => (QueryCosts.costOf(q), q))
  private val onePassQ = byCost.head
  private val multiPassQ = SparkEntry.queries.keySet.toSeq
    .filter(q => QueryCosts.sf01Min.get(q).exists(c => c >= 0.35 && c < 0.7))
    .minBy(q => (QueryCosts.costOf(q), q))

  test("subset queries are registered and canon-ordered as the spec assumes") {
    (subset :+ multiPassQ).foreach { q =>
      assert(SparkEntry.queries.contains(q), s"$q not registered")
      assert(SparkEntry.oracleSql.contains(q), s"$q has no oracle")
      assert(QueryCosts.sf01Min.contains(q), s"$q not in canon")
    }
    assert(QueryCosts.costOf(onePassQ) < 0.25, "one-pass fixture too slow")
    assert(QueryCosts.costOf(multiPassQ) >= 0.35, "multi-pass fixture too fast")
  }

  test("Verify bootstraps a valid empty manifest before any Spark session exists") {
    val out = Files.createTempDirectory("graft-harness-boot").toString
    // BOOTSTRAP_ONLY returns right after the startup manifest write,
    // BEFORE SparkSession construction — so a manifest here proves the
    // write needs no session: a driver kill during compile/startup
    // leaves `{}` ("started, certified nothing"), never a missing file.
    withProps(Map("SPARK_GRAFT_VERIFY_BOOTSTRAP_ONLY" -> "1")) {
      Verify.main(Array("/root/testdata/sf0.001", out))
    }
    assert(readManifest(out) === Map.empty)
    assert(!Files.exists(Paths.get(s"$out/oracle_sql.json.tmp")))
    // A bootstrapped-then-killed run followed by a real subset run must
    // end with the subset certified (the empty bootstrap merges away).
    withProps(Map(
      "SPARK_GRAFT_VERIFY_QUERIES" -> subset.mkString(","))) {
      Verify.main(Array("/root/testdata/sf0.001", out))
    }
    assert(readManifest(out).keySet === subset.toSet)
  }

  test("Verify prints a bootstrap line and one progress line per landed dump") {
    val out = Files.createTempDirectory("graft-harness-progress").toString
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true)) {
      withProps(Map(
        "SPARK_GRAFT_VERIFY_QUERIES" -> subset.mkString(","),
        "SPARK_GRAFT_VERIFY_PARALLEL" -> "2")) {
        Verify.main(Array("/root/testdata/sf0.001", out))
      }
    }
    val lines = buf.toString.linesIterator.toSeq
    assert(lines.exists(_.startsWith("[verify] manifest bootstrapped")),
      s"no bootstrap line in: $lines")
    subset.foreach { q =>
      assert(lines.exists(l => l.startsWith("[verify] ") && l.contains(s" $q ok")),
        s"no progress line for $q in: $lines")
    }
    assert(lines.exists(_.startsWith(s"[verify] done: ${subset.size}/${subset.size}")))
  }

  test("Verify killed mid-run leaves a valid manifest covering every landed dump") {
    val out = Files.createTempDirectory("graft-harness-verify").toString
    // "Kill" after the first dump: manifest must hold exactly the
    // cheapest query, already selfcheck-consumable.
    withProps(Map(
      "SPARK_GRAFT_VERIFY_QUERIES" -> subset.mkString(","),
      "SPARK_GRAFT_VERIFY_ABORT_AFTER" -> "1")) {
      Verify.main(Array("/root/testdata/sf0.001", out))
    }
    val m1 = readManifest(out)
    assert(m1.keySet === Set(byCost.head))
    assert(m1(byCost.head) === SparkEntry.oracleSql(byCost.head))
    assert(Files.isDirectory(Paths.get(s"$out/${byCost.head}")))
    // No manifest row without a parquet dir, and no leftover temp file.
    assert(!Files.exists(Paths.get(s"$out/oracle_sql.json.tmp")))
    assert(!Files.isDirectory(Paths.get(s"$out/${byCost(1)}")))

    // Second truncated run (abort after 2): re-dumps cheapest-first,
    // merges over the prior manifest — now exactly the two cheapest.
    withProps(Map(
      "SPARK_GRAFT_VERIFY_QUERIES" -> subset.mkString(","),
      "SPARK_GRAFT_VERIFY_ABORT_AFTER" -> "2")) {
      Verify.main(Array("/root/testdata/sf0.001", out))
    }
    assert(readManifest(out).keySet === byCost.take(2).toSet)

    // Full (un-truncated) subset run completes the manifest.
    withProps(Map(
      "SPARK_GRAFT_VERIFY_QUERIES" -> subset.mkString(","))) {
      Verify.main(Array("/root/testdata/sf0.001", out))
    }
    val m3 = readManifest(out)
    assert(m3.keySet === subset.toSet)
    subset.foreach { q =>
      assert(m3(q) === SparkEntry.oracleSql(q))
      assert(Files.isDirectory(Paths.get(s"$out/$q")))
    }
  }

  test("Verify dumps every selected query cheapest-first by canon minima") {
    val out = Files.createTempDirectory("graft-harness-order").toString
    withProps(Map(
      "SPARK_GRAFT_VERIFY_QUERIES" -> subset.mkString(","),
      "SPARK_GRAFT_VERIFY_PARALLEL" -> "1")) { // deterministic completion order
      Verify.main(Array("/root/testdata/sf0.001", out))
    }
    // Dump order is observable through parquet dir mtimes.
    val mtimes = subset.map { q =>
      q -> Files.getLastModifiedTime(Paths.get(s"$out/$q")).toMillis }
    assert(mtimes.sortBy(_._2).map(_._1) === byCost)
  }

  test("Verify with concurrent dumps lands every query and a complete manifest") {
    val out = Files.createTempDirectory("graft-harness-par").toString
    withProps(Map(
      "SPARK_GRAFT_VERIFY_QUERIES" -> subset.mkString(","),
      "SPARK_GRAFT_VERIFY_PARALLEL" -> "3")) {
      Verify.main(Array("/root/testdata/sf0.001", out))
    }
    val m = readManifest(out)
    assert(m.keySet === subset.toSet)
    subset.foreach { q =>
      assert(Files.isDirectory(Paths.get(s"$out/$q")))
      assert(m(q) === SparkEntry.oracleSql(q))
    }
    assert(!Files.exists(Paths.get(s"$out/oracle_sql.json.tmp")))
  }

  test("Bench stops re-measuring a row whose pass-1 time matches its canon cost") {
    val out = Files.createTempDirectory("graft-harness-bench")
      .resolve("bench.json").toString
    // A huge retry factor makes every pass-1 measurement read as
    // "matches canon" → both rows run exactly once and the sweep is a
    // single pass, deterministically.
    withProps(Map(
      "SPARK_GRAFT_QUERIES" -> s"$onePassQ,$multiPassQ",
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      "SPARK_GRAFT_BENCH_RETRY_FACTOR" -> "1e9",
      "SPARK_GRAFT_BENCH_OUT" -> out)) {
      Bench.main(Array.empty)
    }
    val node = om.readTree(Paths.get(out).toFile)
    assert(node.get("metric").asText === "total")
    assert(node.get("passes_completed").asInt === 1,
      "no retries → passes 2-3 are empty and never run")
    assert(node.get("failed").size === 0)
    val passes = node.get("passes")
    assert(passes.get(onePassQ).size === 1)
    assert(passes.get(multiPassQ).size === 1)
    val qs = node.get("queries")
    assert(qs.get(onePassQ).asDouble > 0)
    assert(qs.get(multiPassQ).asDouble > 0)
  }

  test("Bench retries rows whose measurements blow past canon, and reports the min") {
    val out = Files.createTempDirectory("graft-harness-retry")
      .resolve("bench.json").toString
    // Factor 0 → every row always reads as contention-polluted → full
    // min-of-3 (also the protocol for dedicated canonical re-pin runs).
    withProps(Map(
      "SPARK_GRAFT_QUERIES" -> s"$onePassQ,$multiPassQ",
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      "SPARK_GRAFT_BENCH_RETRY_FACTOR" -> "0",
      "SPARK_GRAFT_BENCH_OUT" -> out)) {
      Bench.main(Array.empty)
    }
    val node = om.readTree(Paths.get(out).toFile)
    val passes = node.get("passes")
    assert(passes.get(onePassQ).size === 3,
      "polluted row must be re-measured in the remaining passes")
    assert(passes.get(multiPassQ).size === 3)
    assert(node.get("passes_completed").asInt === 3)
    // Minimum over the recorded passes is what "queries" reports.
    val mins = (0 until 3).map(i => passes.get(multiPassQ).get(i).asDouble)
    assert(math.abs(node.get("queries").get(multiPassQ).asDouble - mins.min) < 1e-9)
  }

  test("Bench killed between passes leaves a parseable artifact covering the completed passes") {
    val out = Files.createTempDirectory("graft-harness-kill")
      .resolve("bench.json").toString
    // Factor 0 forces a 3-pass row; aborting after pass 1 is
    // byte-identical to a SIGKILL during pass 2, because the pass-1
    // flush already landed atomically.
    withProps(Map(
      "SPARK_GRAFT_QUERIES" -> multiPassQ,
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      "SPARK_GRAFT_BENCH_RETRY_FACTOR" -> "0",
      "SPARK_GRAFT_BENCH_ABORT_AFTER_PASS" -> "1",
      "SPARK_GRAFT_BENCH_OUT" -> out)) {
      Bench.main(Array.empty)
    }
    val node = om.readTree(Paths.get(out).toFile)
    assert(node.get("passes_completed").asInt === 1)
    assert(node.get("passes").get(multiPassQ).size === 1)
    assert(node.get("queries").get(multiPassQ).asDouble > 0)
    assert(node.get("metric").asText === "total")
  }

  test("parallel-dump safety: temp-view names are globally unique in main sources") {
    // Verify runs dumps CONCURRENTLY on one shared session; temp views
    // are session-global, so two queries registering the same view name
    // would race nondeterministically. All current queries use
    // per-query-prefixed literals — this pins that invariant for every
    // future query. (Source scan; dynamic names would need their own
    // uniqueness argument and a doc note here.)
    val root = Paths.get("src/main/scala/graft")
    assert(Files.isDirectory(root), s"spec expects repo-root cwd, got ${Paths.get("").toAbsolutePath}")
    val re = "createOrReplaceTempView\\(\"([^\"]+)\"\\)".r
    val it = Files.walk(root).iterator()
    var names = List.empty[String]
    while (it.hasNext) {
      val p = it.next()
      if (p.toString.endsWith(".scala"))
        names ++= re.findAllMatchIn(Files.readString(p)).map(_.group(1))
    }
    assert(names.nonEmpty, "scan found no temp views — pattern or path drifted")
    val dups = names.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    assert(dups.isEmpty, s"temp-view names registered by more than one site: $dups")
  }

  test("Bench's stdout ends each pass with a compact line that survives a 2 KB tail") {
    val out = Files.createTempDirectory("graft-harness-compact")
      .resolve("bench.json").toString
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true)) {
      withProps(Map(
        "SPARK_GRAFT_QUERIES" -> s"$onePassQ,$multiPassQ",
        "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
        "SPARK_GRAFT_BENCH_PASSES" -> "1",
        "SPARK_GRAFT_BENCH_OUT" -> out)) {
        Bench.main(Array.empty)
      }
    }
    val lines = buf.toString.linesIterator.filter(_.nonEmpty).toSeq
    // The LAST stdout line is the compact one — that is what a driver
    // keeping only a stdout tail parses.
    val last = lines.last
    assert(last.length < 512, s"compact line too long for a tail: ${last.length}")
    val node = om.readTree(last)
    assert(node.get("compact").asBoolean)
    assert(node.get("metric").asText === "total")
    assert(node.get("queries").size === 0)
    assert(node.get("n_queries").asInt === 2)
    assert(node.get("passes_completed").asInt === 1)
    assert(node.get("failed").size === 0)
    assert(node.get("value").asDouble > 0)
    assert(node.has("retry_factor") && node.has("warmup_floor_sec"))
    // The compact total must agree with the full artifact's.
    val full = om.readTree(Paths.get(out).toFile)
    assert(math.abs(full.get("value").asDouble - node.get("value").asDouble) < 1e-9)
    assert(!full.has("compact"), "file artifact stays the full line")
  }

  test("Bench defaults to full min-of-3 and full warm-up off the canon sf0.1 scale") {
    val out = Files.createTempDirectory("graft-harness-noncanon")
      .resolve("bench.json").toString
    // sf0.001 + NO retry-factor env: the canon hints must not apply —
    // the row re-measures all three passes even though its wall time
    // is far below its sf0.1 canon cost.
    withProps(Map(
      "SPARK_GRAFT_QUERIES" -> onePassQ,
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      "SPARK_GRAFT_BENCH_OUT" -> out)) {
      Bench.main(Array.empty)
    }
    val node = om.readTree(Paths.get(out).toFile)
    assert(node.get("retry_factor").asDouble === 0.0)
    assert(node.get("warmup_floor_sec").asDouble === 0.0)
    assert(node.get("passes_completed").asInt === 3)
    assert(node.get("passes").get(onePassQ).size === 3)
  }

  test("Bench honors SPARK_GRAFT_BENCH_PASSES=1 with a valid single-pass artifact") {
    val out = Files.createTempDirectory("graft-harness-bench1")
      .resolve("bench.json").toString
    withProps(Map(
      "SPARK_GRAFT_QUERIES" -> multiPassQ,
      "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
      "SPARK_GRAFT_BENCH_PASSES" -> "1",
      "SPARK_GRAFT_BENCH_OUT" -> out)) {
      Bench.main(Array.empty)
    }
    val node = om.readTree(Paths.get(out).toFile)
    assert(node.get("passes_completed").asInt === 1)
    assert(node.get("passes").get(multiPassQ).size === 1)
    assert(node.get("queries").get(multiPassQ).asDouble > 0)
  }
}

object HarnessSpec {
  /** sys.props are JVM-global; suites may run in parallel threads. */
  val propLock = new Object
}
