package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Structured Streaming counterpart of the batch incremental load.
  *
  * The reference is strictly batch — its "incrementality" is the
  * anti-join re-run on a schedule (SURVEY §2.9). On a continuously-fed
  * lake the same contract (each logical key lands exactly once) is the
  * streaming dedup below; the windowed aggregation is the standing
  * analog of the per-run count logging.
  *
  * Scale notes: `dropDuplicates` keeps per-key state bounded by the
  * watermark horizon (state for keys older than the delay is evicted),
  * so state size is O(keys per horizon), not O(all keys ever). The
  * windowed count uses the same watermark to emit finalized windows
  * and discard their state.
  */
object IncrementalStream {

  /** Exactly-once-per-key stream: the streaming equivalent of the
    * null-safe anti-join incremental load (J3). `eventTime` bounds the
    * dedup state via the watermark. */
  def dedupStream(stream: DataFrame, keys: Seq[String], eventTime: String,
      delay: String): DataFrame =
    stream
      .withWatermark(eventTime, delay)
      .dropDuplicates(keys :+ eventTime)

  /** Watermarked gap-based session windows per key — the SAME
    * `session_window` expression as the batch `sessionize` query
    * (graft.queries.PipelineQueries), run over a stream: sessions
    * grow while events keep arriving within `gap` of the previous
    * one, finalize when the watermark passes their end, and their
    * state is then evicted. */
  def sessionCounts(stream: DataFrame, eventTime: String, key: Column,
      gap: String, delay: String): DataFrame =
    stream
      .withWatermark(eventTime, delay)
      .groupBy(key, session_window(col(eventTime), gap).as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(key, col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n"))

  /** Watermarked tumbling-window counts per category column. */
  def windowedCounts(stream: DataFrame, eventTime: String, category: Column,
      windowLength: String, delay: String): DataFrame =
    stream
      .withWatermark(eventTime, delay)
      .groupBy(window(col(eventTime), windowLength), category)
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        category, col("n"))

  /** Stream-static enrichment: the streaming analog of
    * [[graft.etl.LookupRemap.remap]] — each micro-batch left-joins the
    * (small, broadcast) static lookup dim and overwrites `column` with
    * the remapped value on hit, keeping the original on miss. The
    * static side is re-resolved per micro-batch by Structured
    * Streaming, so a reloaded lookup table is picked up without
    * restarting the query; the join never shuffles the stream side
    * (broadcast hash join — the only join shape that holds at
    * 100 TB/day stream volume). */
  def remapStream(stream: DataFrame, lookup: DataFrame, column: String,
      srcName: String = "source_name",
      tgtName: String = "target_name"): DataFrame = {
    // Same guard as the batch LookupRemap.remap: dedup the lookup on its
    // source key before joining — duplicate lookup keys would otherwise
    // silently duplicate stream records in EVERY micro-batch (the
    // FIXTURES §A2 fan-out hazard, worse here because it compounds).
    val tag = s"__lkp_$column"
    val dim = broadcast(
      lookup.select(col(srcName).as(s"${tag}_src"), col(tgtName).as(s"${tag}_tgt"))
        .dropDuplicates(s"${tag}_src"))
    stream
      .join(dim, stream(column) === col(s"${tag}_src"), "left")
      .withColumn(column,
        coalesce(col(s"${tag}_tgt"), stream(column)))
      .drop(s"${tag}_src", s"${tag}_tgt")
  }

  /** Watermarked stream-stream interval join — the streaming analog of
    * the batch range join ([[graft.etl.RangeJoin]]): match `left` and
    * `right` records with equal keys whose event times are within
    * `within` of each other (the impression->click attribution shape).
    *
    * Both sides carry watermarks and the join condition carries an
    * explicit time band, which is exactly what Structured Streaming
    * needs to bound state: a buffered left row is evicted once the
    * right watermark passes `leftTime + within` (and vice versa), so
    * state is O(rows per band horizon) per side, never O(stream).
    * Key and time column names must differ between the two sides —
    * stream-stream joins have no alias disambiguation. `joinType`
    * supports the outer variants ("leftOuter"/"rightOuter"/
    * "fullOuter"), where non-matches emit with nulls after the
    * watermark closes their band. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      delay: String, within: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTime, delay)
    val r = right.withWatermark(rightTime, delay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $within") &&
        col(rightTime) <= col(leftTime) + expr(s"INTERVAL $within"),
      joinType)
  }

  /** Exactly-once-per-key streaming load into a batch target:
    * `foreachBatch` running the SAME anti-join incremental cycle the
    * batch jobs run ([[graft.etl.Sink.incrementalLoad]]). foreachBatch
    * delivery is at-least-once — a failed epoch REPLAYS — and the
    * null-safe anti-join is what makes the replay idempotent: a
    * replayed record matches its already-appended copy and drops, so
    * each logical key lands exactly once. That is the reference's
    * whole load contract (J3) carried to a continuously-fed source,
    * with no new machinery: the stream is just a sequence of batch
    * incremental loads.
    *
    * Scale note: each micro-batch anti-joins against the CURRENT
    * target, so target reads grow with target size — the same cost
    * profile as the reference's scheduled re-runs. A bucketed target
    * ([[graft.etl.Sink.writeBucketed]]) keeps that join co-located. */
  def incrementalSink(stream: DataFrame, path: String, keys: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Sink.incrementalLoad(batch.sparkSession, batch, path, keys)
        ()
      }
      .start()

  /** [[incrementalSink]] against a JDBC target — the reference's
    * ACTUAL sink type (SURVEY §2.1 S6), streamed: each micro-batch
    * anti-joins the current table state over a JDBC scan and appends
    * only new keys, so at-least-once epoch replay still lands each
    * logical key exactly once in the database. The anti-join carries
    * the idempotence; no database-side merge/upsert is required —
    * exactly the property the reference's scheduled batch re-runs rely
    * on. Proven end-to-end against embedded Derby with a redelivered
    * batch in `JdbcIntegrationSpec`. */
  def incrementalSinkJdbc(stream: DataFrame, conn: graft.sources.Jdbc.Conn,
      table: String, keys: Seq[String], checkpoint: String,
      writePartitions: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val target = graft.sources.Jdbc.tableScan(spark, conn, table)
        val fresh = graft.etl.Incremental.newRecords(batch, target, keys)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        try {
          if (fresh.count() > 0)
            graft.sources.Jdbc.append(fresh, conn, table, writePartitions)
        } finally { fresh.unpersist(); () }
      }
      .start()

  /** A keyed record for the custom-state operator: `seq` orders
    * records within a key (extraction id / event time as long), `value`
    * is the payload. */
  final case class Rec(key: Long, seq: Long, value: String)

  /** Custom-state streaming operator (`flatMapGroupsWithState`): the
    * streaming analog of [[graft.etl.Dedup.latestPerKey]] as a CHANGE
    * stream — per key, keep the greatest-(seq, value) record ever seen
    * in [[org.apache.spark.sql.streaming.GroupState]] and emit a row
    * only when a batch ADVANCES it. Late or replayed records (seq not
    * past the stored one) emit nothing, so downstream sees exactly the
    * upsert sequence a batch anti-join load would have appended, one
    * event per actual change.
    *
    * State is one record per key — the 100 TB concern is key
    * cardinality, not throughput; bound it with a state timeout
    * (processing-time) when the key space is unbounded. */
  def latestChanges(stream: Dataset[Rec]): Dataset[Rec] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    stream
      .groupByKey(_.key)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[Rec, Rec](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Rec], state: GroupState[Rec]) =>
          val candidates = state.getOption.iterator ++ rows
          val newest = candidates.maxBy(r => (r.seq, r.value))
          if (state.getOption.contains(newest)) Iterator.empty
          else {
            state.update(newest)
            Iterator.single(newest)
          }
      }(org.apache.spark.sql.Encoders.product[Rec],
        org.apache.spark.sql.Encoders.product[Rec])
  }

  /** Streaming SCD2 episode detection — the streaming analog of
    * [[graft.etl.Scd2.historize]]'s change-detection half: per key,
    * emit a record exactly when the tracked VALUE changes from the
    * previously observed one (the row that OPENS a new episode; the
    * batch operator's `valid_to` chaining is then a trivial downstream
    * join/window over the emitted opens). Same-value advances update
    * the stored sequence silently — the episode stays open; replayed
    * or late records (seq not past the stored one) emit nothing, so
    * at-least-once delivery cannot fabricate episodes.
    *
    * In-order delivery per key is the contract (within a batch, rows
    * are sorted by seq; ACROSS batches a late row is dropped, exactly
    * like the batch operator would collapse it) — put a watermarked
    * sort upstream if the transport reorders. State per key is ONE
    * record, same bound as [[latestChanges]]. Proven equivalent to the
    * batch operator by the differential in `IncrementalStreamSpec`. */
  def episodeOpens(stream: Dataset[Rec]): Dataset[Rec] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    stream
      .groupByKey(_.key)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[Rec, Rec](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Rec], state: GroupState[Rec]) =>
          val out = Seq.newBuilder[Rec]
          var last = state.getOption
          rows.toSeq.sortBy(_.seq).foreach { r =>
            last match {
              case Some(p) if r.seq <= p.seq => // late/replay: no-op
              case Some(p) if p.value == r.value => last = Some(r)
              case _ => out += r; last = Some(r)
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }(org.apache.spark.sql.Encoders.product[Rec],
        org.apache.spark.sql.Encoders.product[Rec])
  }
}
