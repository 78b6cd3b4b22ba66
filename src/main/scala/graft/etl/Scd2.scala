package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 historization — the DWH operator
  * the reference's append-only ODS stops one step short of: instead of
  * keeping only the latest record per key (`Dedup.latestPerKey`) or
  * appending raw duplicates (`Incremental.newRecords`), SCD2 keeps one
  * row per VALUE EPISODE with a half-open validity interval
  * `[valid_from, valid_to)` and an `is_current` flag, so point-in-time
  * queries ("what was this patient's regimen on 2023-04-01?") become a
  * range predicate. The reference's facility/patient dimensions are
  * exactly the tables a production DWH would historize this way.
  *
  * Algorithm (set-based, no cursor loop):
  *  1. one window over (keys, orderCols): mark CHANGE rows — the first
  *     observation per key, or any tracked column differing null-safely
  *     (`NOT (c <=> lag(c))`) from the previous observation;
  *  2. keep only change rows (each opens an episode; consecutive
  *     repeats of the same value collapse away);
  *  3. a second window over the SURVIVORS: `valid_to` = the next
  *     episode's `valid_from`, `is_current` = no successor.
  *
  * Scale shape (100 TB): ONE hash exchange on `keys` — both windows
  * require the same (keys, orderCols-sorted) distribution, and step 3
  * runs on the post-collapse frame (|episodes| << |observations| for
  * dimensions that change rarely), so the second sort is over the
  * already-shrunk data. No self-join, no aggregation, no driver state.
  * Window functions cannot split a single key's partition, but
  * dimension keys are per-entity (bounded fan-in), not hot keys.
  */
object Scd2 {

  /** Historize `df`: one output row per (key, value-episode).
    *
    * @param keys      entity identity (e.g. patient id)
    * @param tracked   columns whose value changes open a new episode;
    *                  compared null-safely, so null->null is NOT a change
    * @param orderCols total observation order within a key — pass a
    *                  tiebreaker (e.g. event id) after the timestamp if
    *                  timestamps can collide
    * @param validCol  the column (usually `orderCols.head`) whose value
    *                  becomes `valid_from` / the successor's `valid_to`
    */
  def historize(
      df: DataFrame,
      keys: Seq[String],
      tracked: Seq[String],
      orderCols: Seq[String],
      validCol: String): DataFrame = {
    require(tracked.nonEmpty && orderCols.nonEmpty, "tracked/orderCols required")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    // First observation per key: lag over a non-null constant is null
    // exactly on the partition's first row (a tracked-column lag can't
    // mark this — a genuinely-null first value would look unchanged).
    val isFirst = lag(lit(1), 1).over(w).isNull
    val changed = tracked.map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce[Column](_ || _)
    val episodes = df
      .withColumn("__chg", isFirst || changed)
      .filter(col("__chg"))
      .drop("__chg")
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    val nextFrom = lead(col(validCol), 1).over(w2)
    episodes.select(
      (keys.map(col) ++ tracked.map(col)) ++ Seq(
        col(validCol).as("valid_from"),
        nextFrom.as("valid_to"),
        nextFrom.isNull.as("is_current")): _*)
  }

  /** Point-in-time lookup over a historized frame: the rows valid AT
    * `at` under the half-open contract — `valid_from <= at < valid_to`,
    * with the open (current) episode matching everything from its
    * `valid_from` on. Exactly one row per key whose history covers
    * `at`; keys first observed later drop out. A pure filter — at
    * scale it rides the scan (and partition-prunes when the history is
    * stored partitioned on `valid_from` ranges). */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))
}
