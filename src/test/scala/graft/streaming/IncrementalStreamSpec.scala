package graft.streaming

import java.sql.Timestamp

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
}
