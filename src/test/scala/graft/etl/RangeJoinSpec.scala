package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[RangeJoin.pointInInterval]]: equivalence with the direct
  * inequality join (boundaries inclusive), bin-size invariance,
  * keyless operation, and the no-nested-loop plan guarantee. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points: DataFrame = spark.range(2000).select(
    (col("id") % 13).as("k"), ((col("id") * 17) % 500).as("t"),
    col("id").as("pid"))

  private def intervals: DataFrame = spark.range(300).select(
    (col("id") % 13).as("ik"), ((col("id") * 29) % 480).as("s"),
    col("id").as("iid"))
    .withColumn("e", col("s") + (col("iid") % 40))

  private def direct: Set[(Long, Long)] =
    points.join(intervals,
        col("k") === col("ik") && col("s") <= col("t") && col("t") <= col("e"))
      .select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("agrees with the direct inequality join at several bin sizes") {
    for (bin <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
          Seq("k"), Seq("ik"), "t", "s", "e", bin)
        .select($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == direct, s"binSize=$bin")
    }
  }

  test("boundaries are inclusive and invalid intervals drop") {
    val p = Seq((1L, 10L, 100L), (1L, 20L, 101L)).toDF("k", "t", "pid")
    val i = Seq((1L, 10L, 20L, 7L), (1L, 30L, 25L, 8L)) // 2nd: end < start
      .toDF("ik", "s", "e", "iid")
    val got = RangeJoin.pointInInterval(p, i, Seq("k"), Seq("ik"),
        "t", "s", "e", 5L)
      .select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 7L), (101L, 7L)))
  }

  test("binning is exact past 2^53 (epoch-nano magnitudes)") {
    // 2^53 + small offsets: a double round-trip rounds these to the same
    // double, mis-binning the point relative to the interval.
    val base = 9007199254740992L // 2^53
    val p = Seq((1L, base + 1L, 100L), (1L, base + 3L, 101L),
        (1L, base - 2L, 102L)).toDF("k", "t", "pid")
    val i = Seq((1L, base + 1L, base + 3L, 7L)).toDF("ik", "s", "e", "iid")
    for (bin <- Seq(1L, 2L, 1000000000L)) {
      val got = RangeJoin.pointInInterval(p, i, Seq("k"), Seq("ik"),
          "t", "s", "e", bin)
        .select($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 7L), (101L, 7L)), s"binSize=$bin")
    }
  }

  test("negative times floor-bin correctly (pre-epoch)") {
    val p = Seq((1L, -7L, 100L), (1L, -12L, 101L)).toDF("k", "t", "pid")
    val i = Seq((1L, -10L, -5L, 7L)).toDF("ik", "s", "e", "iid")
    for (bin <- Seq(1L, 4L, 100L)) {
      val got = RangeJoin.pointInInterval(p, i, Seq("k"), Seq("ik"),
          "t", "s", "e", bin)
        .select($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 7L)), s"binSize=$bin")
    }
  }

  test("shared column names between points and intervals do not break the filter") {
    // Both sides carry a column literally named "s" / "t": the exact
    // filter must bind the interval's bounds and the point's time.
    val p = Seq((1L, 10L, 99L, 100L)).toDF("k", "t", "s", "pid")
    val i = Seq((1L, 5L, 15L, 0L, 7L)).toDF("ik", "s", "e", "t", "iid")
    val got = RangeJoin.pointInInterval(p, i, Seq("k"), Seq("ik"),
        "t", "s", "e", 8L)
      .select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 7L)))
  }

  test("keyless (global intervals) stays an equi-join on the bin") {
    val j = RangeJoin.pointInInterval(points, intervals,
      Seq.empty, Seq.empty, "t", "s", "e", 32L)
    val plan = j.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"keyless range join degraded to nested loop:\n$plan")
    val got = j.select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(intervals,
        col("s") <= col("t") && col("t") <= col("e"))
      .select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
