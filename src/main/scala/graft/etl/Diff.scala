package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table reconciliation — the audit operator a warehouse load needs
  * the morning after: given yesterday's snapshot and today's, classify
  * every key as `added` / `removed` / `changed` / `same` in one pass.
  * The reference pipeline's anti-join answers only "what is new"; a
  * diff answers "what happened", which is what operators actually ask
  * when counts drift.
  *
  * Set-based: ONE null-safe full-outer join on the key set, then a
  * projection classifies each row — no second pass, no driver state.
  * Compared columns use `<=>` so a null-to-value transition counts as
  * a change while null-to-null does not (the same null discipline as
  * the anti-join it complements).
  *
  * Scale shape: the full-outer join is a key-hash exchange of both
  * sides — the unavoidable cost of total reconciliation (AQE handles
  * skew like any join). Both inputs are column-pruned to
  * keys ++ compareCols before the join, so wide snapshots only ship
  * the audited columns. For delta-sized audits, pre-filter either
  * side; for the common "just the changes" report, drop `same` rows
  * with a filter that predicate-pushes into the join's output.
  */
object Diff {

  /** Per-key change classification between two snapshots.
    * Output: key columns (coalesced across sides) + a `change` column
    * in {added, removed, changed, same}. */
  def tableDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys required")
    // A key listed again in compareCols would project duplicate
    // __o_<c>/__n_<c> columns and fail the join with an ambiguous-
    // reference error; dedup keeps the call valid (a key column is
    // equal-by-join on matched rows anyway, so semantics are
    // unchanged).
    val projCols = (keys ++ compareCols).distinct
    // Explicit presence markers, NOT key-null probes: a row whose key
    // components are all legitimately NULL is still present.
    val oldP = oldDf
      .select(projCols.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__o_present", lit(true))
    val newP = newDf
      .select(projCols.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__n_present", lit(true))
    val cond: Column = keys.map(k => col(s"__o_$k") <=> col(s"__n_$k"))
      .reduce(_ && _)
    val inOld = col("__o_present").isNotNull
    val inNew = col("__n_present").isNotNull
    val differs: Column =
      if (compareCols.isEmpty) lit(false)
      else compareCols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
        .reduce(_ || _)
    val keyCols = keys.map(k =>
      coalesce(col(s"__n_$k"), col(s"__o_$k")).as(k))
    oldP.join(newP, cond, "full_outer")
      .select(keyCols :+
        when(!inOld, lit("added"))
          .when(!inNew, lit("removed"))
          .when(differs, lit("changed"))
          .otherwise(lit("same")).as("change"): _*)
  }
}
