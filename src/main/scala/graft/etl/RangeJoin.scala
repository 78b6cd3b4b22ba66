package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range (interval) join — "each point row against the
  * intervals containing it". The direct Spark formulation
  * (`p.join(i, keys && s <= t && t <= e)`) makes the range predicates
  * JOIN FILTERS, not join keys: with selective equi-keys that is fine,
  * but with no key (or a low-cardinality one) the planner degrades to
  * a nested-loop/cartesian over every (point, interval) pair — the
  * classic quadratic range-join trap.
  *
  * The scalable shape (the standard bin-bucketing range-join
  * optimization): quantize time into `binSize`-wide bins; a point
  * lands in one bin, an interval is exploded into every bin it
  * overlaps (bounded by len/binSize + 1 rows), and the join becomes a
  * pure EQUI-join on (keys..., bin) — hash-partitionable, AQE-visible,
  * never nested-loop — followed by the exact range filter. Choose
  * binSize near the typical interval length: fan-out stays O(1) per
  * interval while each bin pairs only co-binned rows.
  *
  * Time columns are LONG (callers quantize dates/timestamps first —
  * epoch days/seconds); intervals are inclusive [start, end], rows
  * with end < start or null bounds drop (SQL comparison semantics).
  */
object RangeJoin {

  /** Exact floor division on longs. A double round-trip
    * (`floor(t / binSize)` via cast) loses precision past 2^53 — epoch
    * micros/nanos qualify — and a mis-binned point silently misses true
    * matches. `t - pmod(t, b)` is an exact multiple of `b`, so integral
    * division (`div`) of the pair is exact floor division for any long. */
  private def floorDivBin(c: Column, binSize: Long): Column =
    call_function("div", c - pmod(c, lit(binSize)), lit(binSize))

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointKeys: Seq[String], intervalKeys: Seq[String],
      t: String, start: String, end: String, binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    require(pointKeys.length == intervalKeys.length, "key arity mismatch")
    val p = points.withColumn("__pbin", floorDivBin(col(t), binSize))
    // end >= start filter also guards sequence(): Spark's
    // sequence(hi, lo) yields a DESCENDING range, not an empty one.
    val i = intervals
      .filter(col(end) >= col(start))
      .withColumn("__ibin", explode(sequence(
        floorDivBin(col(start), binSize),
        floorDivBin(col(end), binSize))))
    val keyCond = pointKeys.zip(intervalKeys)
      .map { case (a, b) => p(a) === i(b) }
      .foldLeft(p("__pbin") === i("__ibin"))(_ && _)
    p.join(i, keyCond)
      // Resolve the exact-range filter against the originating frames:
      // unqualified col(...) would be ambiguous (or bind the wrong
      // side) whenever points and intervals share a column name.
      .filter(i(start) <= p(t) && p(t) <= i(end))
      .drop("__pbin", "__ibin")
  }
}
