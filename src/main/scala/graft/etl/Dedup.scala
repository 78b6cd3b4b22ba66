package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** "Latest record wins" dedup.
  *
  * The reference expresses this as an inner self-join against a
  * `GROUP BY key -> MAX(ID), MAX(cast(created as date))` subquery pushed
  * to SQL Server (reference: `Load CT Patients Job/src/main/resources/
  * LoadSourceCTPatients.sql:10-17`, `Load HTS Clients/src/main/resources/
  * LoadHtsClients.sql:26-34`). Idiomatic Spark is a window + row_number
  * filter: ONE shuffle on the key instead of a scan + aggregate +
  * shuffle-join of the table against itself — strictly better at scale.
  *
  * Both semantics are provided:
  *  - [[latestPerKey]]: window `row_number == 1` ordered by the given
  *    columns descending — the "fixed" semantics (always keeps exactly
  *    one row per key).
  *  - [[maxFieldsDedup]]: the reference's literal semantics — keep rows
  *    matching max(order1) AND max(order2) independently; this can keep
  *    >1 row per key on ties and can DROP a key entirely when the row
  *    with max ID is not the row with max created-date (SURVEY.md §7.4
  *    risk 2). Kept for bit-parity experiments.
  */
object Dedup {

  /** One row per `keys`, the greatest by `order` columns (descending,
    * nulls last). Deterministic iff `order` is a total order per key.
    *
    * Implemented as `max_by` over the ordering struct, not a
    * row_number window: the aggregate combines map-side (partial
    * aggregation), so the shuffle moves one candidate row per key per
    * input partition instead of sorting the whole table — the
    * difference between O(n log n) sort-exchange and near-O(n) at
    * 100 TB. Column order of the output is preserved. */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val payload = df.columns.toSeq
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(order.map(col): _*)).as("__best"))
      .select(payload.map(c => col(s"__best.$c").as(c)): _*)
  }

  /** Window-based formulation of [[latestPerKey]] (kept as the
    * executable reference spec; identical results for total orders).
    * Under [[graft.plans.RankOneToAggregate]] this compiles to the
    * same max_by aggregate as [[latestPerKey]] — the window form is
    * what users write, the aggregate is what executes. */
  def latestPerKeyWindow(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(c => col(c).desc_nulls_last): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Reference-literal dedup: rows where EVERY `maxCols` column equals
    * its per-key max (independent maxima, as in the T-SQL GROUP-BY-MAX
    * self-join). */
  def maxFieldsDedup(df: DataFrame, keys: Seq[String], maxCols: Seq[String]): DataFrame = {
    // Window-based rewrite of the self-join: compute each max over a
    // key-partitioned window (one shuffle, reused for all max columns),
    // then filter. Equivalent to the reference's inner join against the
    // GROUP BY subquery, without scanning the input twice.
    val w = Window.partitionBy(keys.map(col): _*)
    val withMax = maxCols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__max_$i", max(col(c)).over(w))
    }
    // `===` (not `<=>`) to match the reference's T-SQL equality join:
    // NULL = NULL is unknown in T-SQL, so a partition whose max is NULL
    // (all-null column) drops entirely — reference-literal semantics.
    val cond: Column = maxCols.zipWithIndex
      .map { case (c, i) => col(c) === col(s"__max_$i") }
      .reduce(_ && _)
    withMax.filter(cond).drop(maxCols.indices.map(i => s"__max_$i"): _*)
  }

  /** Multi-group form of [[maxFieldsDedup]]: every (keys, maxCols)
    * group's maxima are computed over the SAME input frame and a row
    * must match ALL of them. This mirrors the reference jobs that
    * stack several GROUP-BY-MAX self-joins against the ORIGINAL table
    * (PrEP Visits joins both a (max Created, max ID) and a
    * (max DateExtracted, max ID) subquery — `Load Prep Visits/src/main/
    * resources/LoadPrepVisits.sql:66-75`) — which is NOT equivalent to
    * applying [[maxFieldsDedup]] sequentially: a sequential second
    * pass would recompute its maxima over the survivors of the first,
    * resurrecting rows the reference drops. Groups sharing a key set
    * collapse into one window; distinct key sets each get their own
    * (still one scan — the windows stack over the same frame). */
  def maxFieldsDedupMulti(df: DataFrame,
      groups: Seq[(Seq[String], Seq[String])]): DataFrame = {
    val tagged = groups.zipWithIndex
    val withMax = tagged.foldLeft(df) { case (d, ((keys, maxCols), gi)) =>
      val w = Window.partitionBy(keys.map(col): _*)
      maxCols.zipWithIndex.foldLeft(d) { case (dd, (c, i)) =>
        dd.withColumn(s"__max_${gi}_$i", max(col(c)).over(w))
      }
    }
    val cond: Column = tagged.flatMap { case ((_, maxCols), gi) =>
      maxCols.zipWithIndex.map { case (c, i) => col(c) === col(s"__max_${gi}_$i") }
    }.reduce(_ && _)
    withMax.filter(cond).drop(tagged.flatMap { case ((_, maxCols), gi) =>
      maxCols.indices.map(i => s"__max_${gi}_$i")
    }: _*)
  }
}
