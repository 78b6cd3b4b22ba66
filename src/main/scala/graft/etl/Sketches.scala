package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — the incremental-distinct
  * capability an append-only warehouse needs at 100 TB: "distinct
  * patients ever seen" cannot be recomputed from scratch per load
  * cycle, and a plain `approx_count_distinct` result is a NUMBER
  * that cannot absorb tomorrow's data. An HLL SKETCH is a few-KB
  * binary column that can: store one per (partition, day), union
  * across any grouping later, and estimate on demand — Spark's
  * Datasketches-backed `hll_sketch_agg` / `hll_union_agg` family,
  * wrapped to the load-cycle shape.
  *
  * Scale shape: sketch building is a map-side-combining aggregate
  * (each task folds its rows into one sketch, the exchange carries
  * sketches, not rows); rollups over stored sketches touch
  * |groups| rows, never the history. Error is the standard HLL
  * ~1.04/√(2^lgK) (~1.6% at the default lgK=12), pinned by spec. */
object Sketches {

  /** One HLL sketch per group: (groupCols..., `sketch` binary).
    * Store next to the day's load; tomorrow's sketch unions with it
    * without touching today's rows again. */
  def distinctSketch(df: DataFrame, valueCol: String,
      groupCols: Seq[String], lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll stored sketches up to coarser groups (or to a global row
    * with `groupCols = Nil`): (groupCols..., `estimate` long). */
  def rollupEstimate(sketches: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val unioned =
      if (groupCols.isEmpty)
        sketches.agg(hll_union_agg(col("sketch")).as("sketch"))
      else
        sketches.groupBy(groupCols.map(col): _*)
          .agg(hll_union_agg(col("sketch")).as("sketch"))
    unioned.withColumn("estimate", hll_sketch_estimate(col("sketch")))
      .drop("sketch")
  }
}
