package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates — the counterpart
  * to [[Sketches]] for EXACT summaries: a grouped count/sum/min/max
  * table stored with each load cycle can absorb tomorrow's delta by
  * merging summaries, never re-reading accumulated history. At 100 TB
  * the difference is a job over |delta| + |groups| versus a job over
  * the whole warehouse, every day.
  *
  * Algebra: count and sum merge by +, min/max by min/max — each
  * column's merge function is the aggregate's own combine step, the
  * same decomposition Spark's partial aggregation exploits within one
  * job, lifted across jobs via a stored table. (AVG is derived:
  * store sum and count, divide at read time. Non-algebraic
  * aggregates — exact distinct, percentiles — need [[Sketches]] or a
  * re-aggregation.)
  */
object IncrementalAgg {

  /** Summary spec: output column name -> (per-row aggregate for the
    * initial summarize, summary-merge aggregate for [[merge]]). */
  final case class Metric(name: String, agg: Column,
      mergeAgg: Column => Column)

  def countMetric(name: String = "n"): Metric =
    Metric(name, count(lit(1)), sum(_))

  def sumMetric(c: Column, name: String): Metric =
    Metric(name, sum(c), sum(_))

  def minMetric(c: Column, name: String): Metric =
    Metric(name, min(c), min(_))

  def maxMetric(c: Column, name: String): Metric =
    Metric(name, max(c), max(_))

  /** Grouped summary of a batch: (keys..., metrics...). */
  def summarize(df: DataFrame, keys: Seq[String],
      metrics: Seq[Metric]): DataFrame = {
    require(metrics.nonEmpty, "at least one metric required")
    // No implicit cast: metrics keep their natural aggregate type (a
    // silent cast-to-long would truncate fractional metrics and break
    // the merge-equals-recompute guarantee; callers wanting integer
    // outputs quantize their input columns instead).
    val aggs = metrics.map(m => m.agg.as(m.name))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of summaries produced by [[summarize]] with the
    * SAME keys and metrics: one union + one |groups|-sized aggregate —
    * history is never re-read. New groups appear, existing groups
    * combine; the result is bit-equal to summarizing the concatenated
    * inputs (count/sum: associative integer +; min/max: associative
    * lattice ops). */
  def merge(summaries: Seq[DataFrame], keys: Seq[String],
      metrics: Seq[Metric]): DataFrame = {
    require(summaries.nonEmpty, "at least one summary required")
    val unioned = summaries.reduce(_.unionByName(_))
    val aggs = metrics.map(m => m.mergeAgg(col(m.name)).as(m.name))
    unioned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
