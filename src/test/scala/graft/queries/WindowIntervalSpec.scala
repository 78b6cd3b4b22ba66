package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic pins for the calendar-interval RANGE frame query
  * (`window_interval_frames`) — value parity vs DuckDB is the driver's
  * CORRECTNESS gate; this fixes the two behaviors a ROWS frame or a
  * numeric RANGE frame would get wrong: interval bounds over sparse
  * dates, and same-day peer inclusion independent of tie order. */
class WindowIntervalSpec extends SparkSpec {

  test("trailing 7-day sum follows calendar distance, not row count") {
    import spark.implicits._
    // One customer, orders on day 1, 5, 20: day 5 sees day 1 (4 days
    // back, inside 7), day 20 sees neither (15 days back).
    val t = Seq(
      (1L, 10L, "1995-01-01", 100L),
      (2L, 10L, "1995-01-05", 10L),
      (3L, 10L, "1995-01-20", 1L))
      .toDF("o_orderkey", "o_custkey", "od", "price_c")
      .withColumn("od", col("od").cast("date"))
    val r = t.select(col("o_orderkey"),
        expr("""sum(price_c) OVER (PARTITION BY o_custkey ORDER BY od
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)""")
          .as("trail7_c"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 100L, 2L -> 110L, 3L -> 1L))
  }

  test("same-day peers are all inside each other's frame (RANGE, not ROWS)") {
    import spark.implicits._
    val t = Seq(
      (1L, 10L, "1995-01-01", 7L),
      (2L, 10L, "1995-01-01", 5L), // same day as key 1
      (3L, 10L, "1995-01-02", 1L))
      .toDF("o_orderkey", "o_custkey", "od", "price_c")
      .withColumn("od", col("od").cast("date"))
    val r = t.select(col("o_orderkey"),
        expr("""sum(price_c) OVER (PARTITION BY o_custkey ORDER BY od
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)""")
          .as("trail7_c"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // Both day-1 rows see BOTH day-1 rows (peers); a ROWS frame would
    // give the first of them only its own value (tie-order dependent).
    assert(r(1L) == 12L && r(2L) == 12L && r(3L) == 13L)
  }

  test("registered query runs, is nonempty, and both frames share one window sort") {
    val df = AnalyticsQueries.windowIntervalFrames(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
    // Both interval frames are partitioned+ordered identically, so
    // the physical plan needs exactly ONE window sort pass.
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.split("Window ").length - 1 <= 2, // one Window op (may split per frame spec)
      s"unexpected window op count in:\n$plan")
    val exchanges = plan.split("Exchange ").length - 1
    assert(exchanges <= 2, s"interval frames should share the o_custkey exchange:\n$plan")
  }
}
