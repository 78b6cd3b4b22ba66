package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental aggregate maintenance: merge-equals-recompute across
  * batch counts, orders, and group churn. */
class IncrementalAggSpec extends SparkSpec {

  import spark.implicits._
  import IncrementalAgg._

  private val keys = Seq("g")
  private val metrics = Seq(
    countMetric(),
    sumMetric(col("v"), "sum_v"),
    minMetric(col("v"), "min_v"),
    maxMetric(col("v"), "max_v"))

  private def rows(r: org.apache.spark.sql.DataFrame) =
    r.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
      x.getLong(3), x.getLong(4))).toSet

  test("three-batch merge == full recompute, including groups absent " +
      "from some batches") {
    val all = (1 to 300).map(i =>
      (s"g${i % 5}", i.toLong * (if (i % 2 == 0) 1 else -1)))
      .toDF("g", "v")
    val batches = Seq(
      all.filter(col("v") % 3 === 0),
      all.filter(col("v") % 3 === 1 || col("v") % 3 === -2),
      all.filter(col("v") % 3 === 2 || col("v") % 3 === -1))
    val merged = merge(batches.map(summarize(_, keys, metrics)),
      keys, metrics)
    val direct = summarize(all, keys, metrics)
    assert(rows(merged) == rows(direct) && rows(direct).nonEmpty)
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val mk = (lo: Int, hi: Int) =>
      summarize((lo to hi).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "v"),
        keys, metrics)
    val (a, b, c) = (mk(1, 50), mk(51, 120), mk(121, 200))
    val left = merge(Seq(merge(Seq(a, b), keys, metrics), c), keys, metrics)
    val right = merge(Seq(a, merge(Seq(b, c), keys, metrics)), keys, metrics)
    assert(rows(left) == rows(right))
  }

  test("fractional metrics merge without truncation (no silent " +
      "cast-to-long inside the operator)") {
    val m = Seq(IncrementalAgg.sumMetric(
      org.apache.spark.sql.functions.col("v"), "s"))
    val b1 = IncrementalAgg.summarize(Seq(("g", 0.6)).toDF("g", "v"), keys, m)
    val b2 = IncrementalAgg.summarize(Seq(("g", 0.6)).toDF("g", "v"), keys, m)
    val merged = IncrementalAgg.merge(Seq(b1, b2), keys, m)
      .collect().head.getDouble(1)
    assert(math.abs(merged - 1.2) < 1e-12,
      s"0.6 + 0.6 must merge to 1.2, got $merged (pre-fix: 0)")
  }

  test("a new group arriving only in the delta appears in the merge") {
    val stored = summarize(Seq(("old", 1L), ("old", 2L)).toDF("g", "v"),
      keys, metrics)
    val delta = summarize(Seq(("new", 7L)).toDF("g", "v"), keys, metrics)
    val m = rows(merge(Seq(stored, delta), keys, metrics))
    assert(m == Set(("old", 2L, 3L, 1L, 2L), ("new", 1L, 7L, 7L, 7L)))
  }
}
