package graft.streaming

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Resources

/** Streaming dedup + windowed aggregation over a MemoryStream, plus
  * the classpath resource loader (S8). */
class IncrementalStreamSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupStream emits each (key, eventTime) exactly once") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val stream = ms.toDF().toDF("k", "v", "ts")
    val out = IncrementalStream.dedupStream(stream, Seq("k"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    ms.addData(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (1L, "a", ts("2024-01-01 10:00:00")), // exact dup -> dropped
      (2L, "b", ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    ms.addData((1L, "a", ts("2024-01-01 10:00:00"))) // replay -> dropped
    q.processAllAvailable()
    val rows = spark.table("dedup_out").collect()
    q.stop()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("windowedCounts finalizes watermarked windows") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Timestamp)]
    val stream = ms.toDF().toDF("etype", "ts")
    val out = IncrementalStream.windowedCounts(stream, "ts", col("etype"),
      "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    ms.addData(
      ("click", ts("2024-01-01 10:01:00")),
      ("click", ts("2024-01-01 10:02:00")),
      ("view", ts("2024-01-01 10:03:00")))
    q.processAllAvailable()
    // Advance the watermark far enough to close the 10:00-10:10 window.
    ms.addData(("click", ts("2024-01-01 11:00:00")))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .collect().map(r => (r.getString(2), r.getLong(3))).toMap
    q.stop()
    assert(rows == Map("click" -> 2L, "view" -> 1L))
  }

  test("latestChanges emits one event per actual per-key advance") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[IncrementalStream.Rec]
    val out = IncrementalStream.latestChanges(ms.toDS())
    val q = out.writeStream.format("memory").queryName("latest_out")
      .outputMode("update").start()
    ms.addData(
      IncrementalStream.Rec(1L, 10L, "a"),
      IncrementalStream.Rec(1L, 20L, "b"), // same batch: only the max emits
      IncrementalStream.Rec(2L, 5L, "x"))
    q.processAllAvailable()
    ms.addData(
      IncrementalStream.Rec(1L, 15L, "late"), // behind state -> silent
      IncrementalStream.Rec(2L, 6L, "y"))     // advance -> emits
    q.processAllAvailable()
    ms.addData(IncrementalStream.Rec(2L, 6L, "y")) // exact replay -> silent
    q.processAllAvailable()
    val rows = spark.table("latest_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    q.stop()
    assert(rows == Set((1L, 20L, "b"), (2L, 5L, "x"), (2L, 6L, "y")))
  }

  test("sessionCounts merges in-gap events and finalizes past the watermark") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val out = IncrementalStream.sessionCounts(
      ms.toDF().toDF("uid", "ts"), "ts", col("uid"), "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    ms.addData(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:05:00")),  // within gap -> same session
      (1L, ts("2024-01-01 11:00:00")),  // > 10 min after -> new session
      (2L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // advance the watermark far past every session end
    ms.addData((9L, ts("2024-01-02 00:00:00")))
    q.processAllAvailable()
    val rows = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3))).toSet
    q.stop()
    assert(rows == Set(
      (1L, "2024-01-01 10:00:00.0", 2L),   // merged 2-event session
      (1L, "2024-01-01 11:00:00.0", 1L),
      (2L, "2024-01-01 10:00:00.0", 1L)))
  }

  test("remapStream enriches each micro-batch from the static lookup") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val lookup = Seq(("KEN", "CANON_KENYA"), ("UGA", "CANON_UGANDA"))
      .toDF("source_name", "target_name")
    val out = IncrementalStream.remapStream(
      ms.toDF().toDF("id", "country"), lookup, "country")
    val q = out.writeStream.format("memory").queryName("remap_out")
      .outputMode("append").start()
    ms.addData((1L, "KEN"), (2L, "TZA"), (3L, "UGA"))
    q.processAllAvailable()
    val rows = spark.table("remap_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    q.stop()
    assert(rows == Set(
      (1L, "CANON_KENYA"), (2L, "TZA"), (3L, "CANON_UGANDA")))
  }

  test("remapStream dedups duplicate lookup keys (no micro-batch fan-out)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    // Duplicate source_name rows: without the dedup guard each stream
    // record matching "KEN" would emit twice per micro-batch.
    val lookup = Seq(("KEN", "CANON_KENYA"), ("KEN", "CANON_KENYA_DUP"),
        ("UGA", "CANON_UGANDA"))
      .toDF("source_name", "target_name")
    val out = IncrementalStream.remapStream(
      ms.toDF().toDF("id", "country"), lookup, "country")
    val q = out.writeStream.format("memory").queryName("remap_dup_out")
      .outputMode("append").start()
    ms.addData((1L, "KEN"), (2L, "KEN"), (3L, "TZA"))
    q.processAllAvailable()
    val rows = spark.table("remap_dup_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    q.stop()
    assert(rows.length == 3, s"fan-out: $rows")
    assert(rows.map(_._1) == Seq(1L, 2L, 3L))
    assert(rows(2)._2 == "TZA")
  }

  test("remapStream and batch LookupRemap.remap agree (differential, dup-keyed lookup)") {
    implicit val ctx = spark.sqlContext
    // Duplicate "KEN" rows with DIFFERENT targets: both paths must
    // dedup the lookup before joining (one output row per input row),
    // and each surviving value must come from the duplicate set —
    // which survivor is API-level arbitrary, so rows under an
    // ambiguous key assert set-membership, all others assert exact
    // batch/stream equality.
    val lookup = Seq(("KEN", "CANON_KENYA"), ("KEN", "CANON_KENYA_DUP"),
        ("UGA", "CANON_UGANDA"))
      .toDF("source_name", "target_name")
    val input = Seq((1L, "KEN"), (2L, "TZA"), (3L, "UGA"), (4L, "KEN"))
    val batch = graft.etl.LookupRemap.remap(
        input.toDF("id", "country"), lookup, "country")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap

    val ms = MemoryStream[(Long, String)]
    val out = IncrementalStream.remapStream(
      ms.toDF().toDF("id", "country"), lookup, "country")
    val q = out.writeStream.format("memory").queryName("remap_diff_out")
      .outputMode("append").start()
    ms.addData(input: _*)
    q.processAllAvailable()
    val stream = spark.table("remap_diff_out").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    q.stop()

    assert(stream.length == input.length, s"fan-out/loss: ${stream.toSeq}")
    assert(batch.size == input.length)
    val kenValues = Set("CANON_KENYA", "CANON_KENYA_DUP")
    stream.foreach { case (id, v) =>
      if (id == 1L || id == 4L) {
        assert(kenValues.contains(v), s"id=$id got $v")
        assert(kenValues.contains(batch(id)), s"batch id=$id got ${batch(id)}")
      } else assert(v == batch(id), s"id=$id stream=$v batch=${batch(id)}")
    }
  }

  test("intervalJoin matches stream-stream pairs within the time band only") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val out = IncrementalStream.intervalJoin(
      imps.toDF().toDF("imp_k", "imp_ts"),
      clicks.toDF().toDF("clk_k", "clk_ts"),
      "imp_k", "clk_k", "imp_ts", "clk_ts",
      delay = "5 minutes", within = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    imps.addData(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")))
    clicks.addData(
      (1L, ts("2024-01-01 10:05:00")),  // within 10 min -> match
      (2L, ts("2024-01-01 10:30:00")),  // outside band -> no match
      (3L, ts("2024-01-01 10:01:00")))  // no impression -> no match
    q.processAllAvailable()
    val rows = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    q.stop()
    assert(rows == Set((1L, 1L)))
  }

  test("intervalJoin leftOuter: unmatched left rows emit with nulls after the watermark closes their band") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val out = IncrementalStream.intervalJoin(
      imps.toDF().toDF("imp_k", "imp_ts"),
      clicks.toDF().toDF("clk_k", "clk_ts"),
      "imp_k", "clk_k", "imp_ts", "clk_ts",
      delay = "5 minutes", within = "10 minutes", joinType = "leftOuter")
    val q = out.writeStream.format("memory").queryName("ssj_outer_out")
      .outputMode("append").start()
    imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
    clicks.addData((1L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    // Advance BOTH watermarks far past imp 2's band so its null-extended
    // row finalizes.
    imps.addData((8L, ts("2024-01-01 13:00:00")))
    clicks.addData((9L, ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    val rows = spark.table("ssj_outer_out").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    q.stop()
    assert(rows.contains((1L, Some(1L))), s"matched pair missing: $rows")
    assert(rows.contains((2L, None)), s"outer row missing: $rows")
  }

  test("incrementalSink: replayed batches are idempotent (exactly-once per key)") {
    implicit val ctx = spark.sqlContext
    val target = java.nio.file.Files.createTempDirectory("graft-ssink").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ssink-ck").toString
    val ms = MemoryStream[(Long, String)]
    val q = IncrementalStream.incrementalSink(
      ms.toDF().toDF("k", "v"), target, Seq("k"), ckpt)
    ms.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    assert(spark.read.parquet(target).count() == 2)
    // Redelivery: the same records arrive again (at-least-once source)
    // plus one genuinely new key — only the new key may land.
    ms.addData((1L, "a"), (2L, "b"), (3L, "c"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(target).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")), s"got $rows")
  }

  test("episodeOpens == batch Scd2 episode opens (stream-vs-batch differential)") {
    implicit val ctx = spark.sqlContext
    // Deterministic observation log: 20 keys x 15 ordered observations,
    // values cycling through 3 states with key-dependent phase (so some
    // consecutive observations repeat -> episodes collapse).
    val recs = for (k <- 1L to 20L; s <- 1L to 15L)
      yield IncrementalStream.Rec(k, s, s"v${(k * 7 + s * s) % 3}")
    val ms = MemoryStream[IncrementalStream.Rec]
    val out = IncrementalStream.episodeOpens(ms.toDS())
    val q = out.writeStream.format("memory").queryName("ep_out")
      .outputMode("update").start()
    // Deliver in seq order split across micro-batches (in-order per key,
    // batch boundaries arbitrary).
    recs.sortBy(_.seq).grouped(70).foreach { b =>
      ms.addData(b); q.processAllAvailable()
    }
    // Full at-least-once replay: must fabricate NO new episodes.
    ms.addData(recs); q.processAllAvailable()
    val streamed = spark.table("ep_out").as[IncrementalStream.Rec]
      .collect().toSet
    q.stop()
    val batch = graft.etl.Scd2.historize(
        recs.toDF("key", "seq", "value"),
        keys = Seq("key"), tracked = Seq("value"),
        orderCols = Seq("seq"), validCol = "seq")
      .select(col("key"), col("valid_from").as("seq"), col("value"))
      .as[IncrementalStream.Rec].collect().toSet
    assert(streamed == batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
  }

  test("Resources.loadText reads classpath SQL (S8)") {
    val sql = Resources.loadText("sample_query.sql")
    assert(sql.contains("SELECT DISTINCT o_orderkey"))
    assert(sql.contains("o_orderstatus != 'X'"))
  }

  // ----------------------------------------------------------------
  // Kill-and-restart checkpoint recovery (round-11 verdict task 3):
  // the file-source rows prove replay-immunity via at-least-once
  // redelivery; these two prove STATE-STORE RESTORE — a query is
  // stopped (mid-stream for dedup) and a NEW query instance resumes
  // from the checkpoint dir, where only restored state can produce
  // the asserted output.

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("dedupStream: kill mid-stream, restart from checkpoint — duplicates " +
      "of pre-kill keys still drop (state-store restore, exactly-once output)") {
    val in = tmp("graft-restart-in")
    val ckpt = tmp("graft-restart-ckpt")
    val out = tmp("graft-restart-out")
    val t0 = ts("2024-01-01 10:00:00")
    def writeFile(name: String, ids: Seq[Long]): Unit =
      ids.map(i => (i, t0)).toDF("event_id", "ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$in/$name")
    // 6 files; each re-contains the previous file's ids (cross-batch
    // duplicates inside phase 1 as well).
    for (f <- 0 until 6) {
      val fresh = (f * 10L) until (f * 10L + 10L)
      val dupOfPrev = if (f == 0) Seq.empty[Long]
        else ((f - 1) * 10L) until ((f - 1) * 10L + 10L)
      writeFile(f"file$f%02d", fresh ++ dupOfPrev)
    }
    val schema = spark.read.parquet(s"$in/file00").schema
    def dedupQuery() = IncrementalStream.dedupStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$in/*"),
      Seq("event_id"), "ts", "1 hour")
    // Phase 1: running query, killed after at least one committed batch
    // but (with 6 one-file triggers) before the stream is drained.
    val q1 = dedupQuery().writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).format("parquet")
      .option("path", out).start()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(q1.recentProgress.exists(_.numInputRows > 0),
      "phase 1 never committed a batch")
    q1.stop() // hard stop — not a drained AvailableNow termination
    // Phase 2: new files that duplicate PHASE-1 ids (only restored
    // state can drop these) plus genuinely new ids.
    writeFile("file06", (0L until 30L) ++ (60L until 70L))
    writeFile("file07", (70L until 80L) ++ (40L until 50L))
    val q2 = dedupQuery().writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).format("parquet")
      .option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val counts = spark.read.parquet(out).groupBy("event_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L until 80L).toSet,
      s"missing ids: ${(0L until 80L).toSet -- counts.keySet}")
    val dups = counts.filter(_._2 > 1)
    assert(dups.isEmpty,
      s"ids emitted more than once across the kill/restart: $dups")
  }

  test("episodeOpens: restart from checkpoint restores per-key GroupState — " +
      "a same-value advance after restart opens NO episode") {
    import IncrementalStream.Rec
    val in = tmp("graft-episode-in")
    val ckpt = tmp("graft-episode-ckpt")
    // foreachBatch sink keyed by batchId: idempotent under epoch
    // replay, shared across the two query instances.
    val collected =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, Long, String)]]()
    def run(trigger: org.apache.spark.sql.streaming.Trigger): Unit = {
      val schema = org.apache.spark.sql.Encoders.product[Rec].schema
      val q = IncrementalStream.episodeOpens(
          spark.readStream.schema(schema).parquet(s"$in/*").as[Rec])
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Rec], id: Long) =>
          collected.put(id,
            df.collect().toSeq.map(r => (r.key, r.seq, r.value)))
          ()
        }
        .trigger(trigger).start()
      q.awaitTermination()
    }
    Seq(
      Rec(1L, 1L, "a"), Rec(1L, 2L, "a"), Rec(1L, 3L, "b"),
      Rec(2L, 1L, "x")
    ).toDS().coalesce(1).write.mode("overwrite").parquet(s"$in/file0")
    run(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val phase1 = collected.values.asScala.flatten.toSet
    assert(phase1 == Set((1L, 1L, "a"), (1L, 3L, "b"), (2L, 1L, "x")), phase1)
    // Phase 2 after restart: key 1 advances with the SAME value "b"
    // (emits nothing IFF the stored state survived the restart), then
    // changes to "c" (emits); key 2 sees a late replay (nothing) and a
    // same-value advance (nothing); key 3 is new (emits).
    Seq(
      Rec(1L, 4L, "b"), Rec(1L, 5L, "c"),
      Rec(2L, 0L, "y"), Rec(2L, 2L, "x"),
      Rec(3L, 1L, "q")
    ).toDS().coalesce(1).write.mode("overwrite").parquet(s"$in/file1")
    run(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val all = collected.values.asScala.flatten.toSet
    assert(all == phase1 ++ Set((1L, 5L, "c"), (3L, 1L, "q")),
      s"restart fabricated or lost episodes: $all")
  }

  test("embedding index probe is STATELESS streaming: zero state " +
      "operators, and the stream matches its batch replay") {
    // The scale claim of stream_embedding_dedup_files: center
    // assignment is a projection and the index side is static, so an
    // unbounded stream carries NO state growth — the progress report
    // must show zero state operators.
    val dir = "/root/testdata/sf0.001"
    val matched = graft.queries.StreamingQueries
      .embeddingProbeStream(spark, dir)
    val name = "probe_stateless_test"
    val q = matched.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val progress = q.lastProgress
    assert(progress != null && progress.stateOperators.isEmpty,
      s"expected stateless plan, got ${progress.stateOperators.mkString(",")}")
    assert(spark.table(name).columns.toSeq ==
      Seq("delta_id", "base_id", "score_c"))
    // Stream-vs-batch differential: the same probe computed entirely
    // in batch (same centers, same assignment code, same join) must
    // produce the identical pair set — streaming delivery loses and
    // invents nothing. (The DuckDB oracle replays this relationally;
    // this test pins the Spark-side equivalence in-JVM.)
    import graft.sim.{KMeans, Similarity}
    import org.apache.spark.sql.functions._
    val all = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val base = all.filter(col("id") % 10 < 8)
    val centers = KMeans.fitCenters(base,
      0L until graft.queries.SimQueries.sqrtCells(base), iters = 1)
    def side(df: org.apache.spark.sql.DataFrame, p: String) =
      Similarity.assignByCenters(df, centers)
        .select(col("bucket"), col("id").as(s"${p}_id"),
          col("vec").as(s"${p}_vec"), col("nrm").as(s"${p}_nrm"))
    val batchTruth = side(all.filter(col("id") % 10 >= 8), "delta")
      .join(side(base, "base"), Seq("bucket"))
      .select(col("delta_id"), col("base_id"),
        Similarity.scaledFromParts(
          Similarity.dot(col("delta_vec"), col("base_vec")),
          col("delta_nrm"), col("base_nrm")).as("score_c"))
      .filter(col("score_c") >= 400000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batchTruth,
      s"stream/batch diverge: stream-only ${streamed -- batchTruth}, " +
        s"batch-only ${batchTruth -- streamed}")
  }

  test("PQ-compressed index probe is STATELESS streaming: zero state " +
      "operators, and the stream matches its batch replay") {
    // The 100 TB claim of stream_embedding_dedup_pq_files: the resident
    // side of the stream-static cell join carries PQ codes (the ~6x
    // memory cut where the index lives for the stream's lifetime), the
    // SDC gate and the float verify are projections/static joins, so an
    // unbounded stream carries NO state growth — the progress report
    // must show zero state operators — and compression changes WHERE
    // bytes sit, never which pairs emit.
    val dir = "/root/testdata/sf0.001"
    val matched = graft.queries.StreamingQueries
      .embeddingPqProbeStream(spark, dir)
    val name = "pq_probe_stateless_test"
    val q = matched.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val progress = q.lastProgress
    assert(progress != null && progress.stateOperators.isEmpty,
      s"expected stateless plan, got ${progress.stateOperators.mkString(",")}")
    assert(spark.table(name).columns.toSeq ==
      Seq("delta_id", "base_id", "score_c"))
    // Stream-vs-batch differential: the identical base-trained
    // centers + codebook, SDC gate, and exact verify computed entirely
    // in batch must produce the identical pair set — streaming delivery
    // through the compressed index loses and invents nothing.
    import graft.sim.{KMeans, Pq, Similarity}
    import org.apache.spark.sql.functions._
    val all = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val base = all.filter(col("id") % 10 < 8)
    val centers = KMeans.fitCenters(base,
      0L until graft.queries.SimQueries.sqrtCells(base), iters = 1)
    val cb = Pq.fitCodebooks(base)
    val gate = graft.queries.SimQueries.sdcGateFor(base, cb)
    val bc = Pq.broadcastCodebook(base, cb)
    def coded(df: org.apache.spark.sql.DataFrame, p: String) =
      Similarity.assignByCenters(df, centers)
        .withColumn("codes", Pq.encodeCol("vec", bc))
        .withColumn("rnrm", Pq.normCol("codes", bc))
        .select(col("bucket"), col("id").as(s"${p}_id"),
          col("vec").as(s"${p}_vec"), col("nrm").as(s"${p}_nrm"),
          col("codes").as(s"${p}_codes"), col("rnrm").as(s"${p}_rnrm"))
    val batchTruth = coded(all.filter(col("id") % 10 >= 8), "delta")
      .join(coded(base, "base"), Seq("bucket"))
      .filter(Similarity.scaledFromParts(
        Pq.sdcDotCol("delta_codes", "base_codes", bc),
        col("delta_rnrm"), col("base_rnrm")) >= gate)
      .select(col("delta_id"), col("base_id"),
        Similarity.scaledFromParts(
          Similarity.dot(col("delta_vec"), col("base_vec")),
          col("delta_nrm"), col("base_nrm")).as("score_c"))
      .filter(col("score_c") >= 400000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batchTruth,
      s"stream/batch diverge: stream-only ${streamed -- batchTruth}, " +
        s"batch-only ${batchTruth -- streamed}")
  }

  test("MinHash band-index probe is STATELESS streaming: zero state " +
      "operators, and the stream matches the batch cross-boundary slice") {
    // The scale claim of stream_minhash_dedup_files: shingle → sign →
    // band is a per-row projection, both joins are stream-static
    // (band index, then id-keyed shingle verify), so an unbounded
    // stream carries NO state growth — the progress report must show
    // zero state operators. Truth: the FULL batch self-join's
    // cross-boundary slice — streaming delivery through the deployed
    // band index loses and invents nothing vs the complete pair set.
    val dir = "/root/testdata/sf0.001"
    val matched = graft.queries.StreamingQueries
      .minhashProbeStream(spark, dir)
    val name = "minhash_probe_stateless_test"
    val q = matched.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val progress = q.lastProgress
    assert(progress != null && progress.stateOperators.isEmpty,
      s"expected stateless plan, got ${progress.stateOperators.mkString(",")}")
    assert(spark.table(name).columns.toSeq ==
      Seq("delta_id", "base_id", "jaccard_c"))
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.spread(graft.Tables.documents(spark, dir))
    val isDelta = (c: org.apache.spark.sql.Column) => c % 10 >= 8
    val batchTruth = graft.text.MinHashLSH.nearDuplicates(docs, "doc_id",
        "text", ngram = 3, perms = 16, bandRows = 4, threshold = 0.5)
      .filter(isDelta(col("doc_a")) =!= isDelta(col("doc_b")))
      .select(
        when(isDelta(col("doc_a")), col("doc_a")).otherwise(col("doc_b"))
          .as("delta_id"),
        when(isDelta(col("doc_a")), col("doc_b")).otherwise(col("doc_a"))
          .as("base_id"),
        col("jaccard_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batchTruth.nonEmpty,
      "fixture no longer produces cross-boundary near-dup pairs")
    val streamed = spark.table(name).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batchTruth,
      s"stream/batch diverge: stream-only ${streamed -- batchTruth}, " +
        s"batch-only ${batchTruth -- streamed}")
  }

  test("engine-chosen streamed probe dispatches exactly its operators " +
      "on both sides of a forced payload bound") {
    // The streaming member of the float<->PQ payload dispatch family:
    // under the real 2 GiB budget the fixture's resident index is tiny,
    // so the dispatch must BE the float probe; under a forced 1-byte
    // budget it must BE the compressed probe — identical emissions in
    // both cases, proven by running each branch pair through the same
    // AvailableNow replay.
    val dir = "/root/testdata/sf0.001"
    def emissions(matched: org.apache.spark.sql.DataFrame,
        name: String): Set[(Long, Long, Long)] = {
      val q = matched.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    import graft.queries.StreamingQueries
    val autoFloat = emissions(
      StreamingQueries.embeddingProbeStreamAuto(spark, dir), "auto_float_t")
    val floatTruth = emissions(
      StreamingQueries.embeddingProbeStream(spark, dir), "float_truth_t")
    assert(autoFloat.nonEmpty && autoFloat == floatTruth,
      s"float side: auto ${autoFloat.size} pairs vs operator " +
        s"${floatTruth.size}; diff ${autoFloat.diff(floatTruth) ++
          floatTruth.diff(autoFloat)}")
    val autoPq = emissions(
      StreamingQueries.embeddingProbeStreamAuto(spark, dir,
        payloadMax = 1L), "auto_pq_t")
    val pqTruth = emissions(
      StreamingQueries.embeddingPqProbeStream(spark, dir), "pq_truth_t")
    assert(autoPq.nonEmpty && autoPq == pqTruth,
      s"PQ side: auto ${autoPq.size} pairs vs operator ${pqTruth.size}; " +
        s"diff ${autoPq.diff(pqTruth) ++ pqTruth.diff(autoPq)}")
  }

  test("re-ingested ids through the streamed probes: overlap guard drops " +
      "self-pairs, keeps statelessness, and the registry split skips it") {
    // The streaming face of the batch incremental paths' disjointIds
    // contract (MinHashLSH.incrementalPairs, TextQueries
    // .simhashIncrementalPairs): a document/vector RE-INGESTED after
    // index deployment is its own nearest neighbour — without a guard
    // every probe emits a degenerate self-pair. Callers without a
    // disjointness proof get a stateless self-pair filter; the
    // registered rows' internal %10 split IS a proof, so their plans
    // (and oracle hashes) stay guard-free.
    implicit val ctx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    import graft.queries.StreamingQueries
    // Run a probe frame through a memory sink; return its emissions
    // and whether the executed plan stayed stateless.
    var tick = 0
    def emissions(matched: org.apache.spark.sql.DataFrame)
        : (Set[(Long, Long)], Boolean) = {
      tick += 1
      val name = s"reingest_probe_$tick"
      val q = matched.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val stateless = q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty
      (spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet, stateless)
    }

    // --- MinHash band-index probe ---
    val doc = graft.Tables.spread(graft.Tables.documents(spark, dir))
      .filter(col("doc_id") % 10 < 8 && length(col("text")) >= 10)
      .select("doc_id", "text").head()
    val docId = doc.getLong(0)
    def docDelta(): org.apache.spark.sql.DataFrame = {
      val ms = MemoryStream[(Long, String)]
      ms.addData((docId, doc.getString(1)))
      ms.toDF().toDF("doc_id", "text")
    }
    val (mhUnguarded, _) = emissions(StreamingQueries.minhashProbeStream(
      spark, dir, Some(docDelta()), disjointIds = true))
    assert(mhUnguarded.contains((docId, docId)),
      "re-ingested doc must self-match when the guard is waived — " +
        "otherwise this test proves nothing")
    val (mhGuarded, mhStateless) = emissions(StreamingQueries
      .minhashProbeStream(spark, dir, Some(docDelta())))
    assert(!mhGuarded.exists(p => p._1 == p._2),
      s"self-pair leaked through the minhash guard: $mhGuarded")
    assert(mhGuarded == mhUnguarded.filterNot(p => p._1 == p._2),
      "guard must remove ONLY self-pairs")
    assert(mhStateless, "overlap guard added a state operator")

    // --- embedding float + PQ probes ---
    val vecRow = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
      .filter(col("vec_id") % 10 < 8)
      .select("vec_id", "embedding").head()
    val vecId = vecRow.getLong(0)
    val vec = vecRow.getSeq[Float](1).toArray
    def vecDelta(): org.apache.spark.sql.DataFrame = {
      val ms = MemoryStream[(Long, Array[Float])]
      ms.addData((vecId, vec))
      ms.toDF().toDF("id", "vec")
    }
    for ((label, probe) <- Seq(
        ("float", (d: org.apache.spark.sql.DataFrame, disjoint: Boolean) =>
          StreamingQueries.embeddingProbeStream(spark, dir, Some(d), disjoint)),
        ("pq", (d: org.apache.spark.sql.DataFrame, disjoint: Boolean) =>
          StreamingQueries.embeddingPqProbeStream(spark, dir, Some(d), disjoint)))) {
      val (unguarded, _) = emissions(probe(vecDelta(), true))
      assert(unguarded.contains((vecId, vecId)),
        s"$label: re-ingested vector must self-match when the guard is waived")
      val (guarded, stateless) = emissions(probe(vecDelta(), false))
      assert(!guarded.exists(p => p._1 == p._2),
        s"$label: self-pair leaked through the guard: $guarded")
      assert(guarded == unguarded.filterNot(p => p._1 == p._2),
        s"$label: guard must remove ONLY self-pairs")
      assert(stateless, s"$label: overlap guard added a state operator")
    }
  }
}
