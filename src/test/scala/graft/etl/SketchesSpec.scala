package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mergeable HLL sketch columns (`etl/Sketches`): error bound vs
  * exact, and the property that makes them a warehouse primitive —
  * unions over STORED per-day sketches equal a fresh sketch over the
  * union of the days' rows, so incremental distinct never re-reads
  * history. */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private def users(lo: Long, hi: Long, day: String) =
    (lo until hi).map(i => (s"u$i", day)).toDF("user", "day")

  test("estimate within the HLL error envelope of the exact count") {
    val df = users(0, 20000, "d1")
    val est = Sketches.rollupEstimate(
      Sketches.distinctSketch(df, "user", Seq("day")), Nil)
      .head.getLong(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05,
      s"estimate $est vs exact 20000")
  }

  test("union of stored per-day sketches == sketch of unioned rows") {
    // Two days with a 5k-user overlap: 0-15k and 10k-25k -> 25k true.
    val d1 = users(0, 15000, "d1")
    val d2 = users(10000, 25000, "d2")
    val stored = Sketches.distinctSketch(d1, "user", Seq("day"))
      .unionByName(Sketches.distinctSketch(d2, "user", Seq("day")))
    val viaUnion = Sketches.rollupEstimate(stored, Nil).head.getLong(0)
    val fresh = Sketches.rollupEstimate(
      Sketches.distinctSketch(d1.unionByName(d2), "user", Seq("day")), Nil)
      .head.getLong(0)
    // Merge-equivalence is exact for HLL (register-wise max), so the
    // two estimates must agree exactly, and both must sit near truth.
    assert(viaUnion == fresh, s"merge broke: $viaUnion vs $fresh")
    assert(math.abs(viaUnion - 25000.0) / 25000.0 < 0.05, s"$viaUnion vs 25000")
  }

  test("rollup to intermediate grouping levels") {
    val df = users(0, 1000, "d1").withColumn("region",
      when(length(col("user")) % 2 === 0, "east").otherwise("west"))
    val perDayRegion = Sketches.distinctSketch(df, "user", Seq("day", "region"))
    val perRegion = Sketches.rollupEstimate(perDayRegion, Seq("region"))
    val ests = perRegion.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ests.keySet == Set("east", "west"))
    assert(math.abs(ests.values.sum - 1000.0) / 1000.0 < 0.05,
      s"regional estimates $ests")
  }

  test("sketch aggregation is map-side combining (exchange carries sketches)") {
    val df = users(0, 5000, "d1").repartition(8)
    val plan = Sketches.distinctSketch(df, "user", Seq("day"))
      .queryExecution.executedPlan.toString
    // Partial + final ObjectHashAggregate around one exchange: rows
    // fold into sketches BEFORE the shuffle.
    assert(plan.contains("hll_sketch_agg"), plan)
    assert(plan.toLowerCase.contains("partial_hll_sketch_agg") ||
      countOf(plan, "Aggregate") >= 2,
      s"no partial aggregation visible:\n$plan")
  }

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)
}
