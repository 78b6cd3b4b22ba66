package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
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
}
