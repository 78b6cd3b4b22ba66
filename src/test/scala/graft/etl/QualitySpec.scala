package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Declarative DQ profiling: rule values, single-pass plan shape,
  * approx-distinct swap. */
class QualitySpec extends SparkSpec {

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("status", StringType, nullable = true),
      StructField("d", StringType, nullable = true)))
    val rows = Seq(
      Row(1L, "A", "2020-01-01"),
      Row(2L, "A", "2020-06-01"),
      Row(2L, "B", "2021-01-01"),   // dup key
      Row(3L, "X", "2020-01-01"),   // domain violation
      Row(null, "B", "2099-01-01"), // null key + future date
      Row(4L, null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  private def metrics(approx: Boolean = false): Map[String, Long] =
    Quality.profile(df, Seq(
        Quality.rowCount(),
        Quality.nullCount("k"),
        Quality.domainViolations("status", Seq("A", "B")),
        Quality.futureDates("d", "2030-12-31"),
        Quality.duplicateKeys("k"),
        Quality.distinctCount("status")),
      approxDistinct = approx)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("every rule classifies its planted defect") {
    val m = metrics()
    assert(m("row_count") == 6L)
    assert(m("null_k") == 1L)
    assert(m("bad_status") == 1L, "X outside {A,B}; null not counted")
    assert(m("future_d") == 1L)
    // 5 non-null key rows over distinct {1,2,3,4} -> 1 duplicate; the
    // null-key row is null_k's finding, not a duplicate.
    assert(m("dup_k") == 1L)
    assert(m("distinct_status") == 3L)
  }

  test("all rules run in ONE aggregate pass (single exchange, no join)") {
    val q = Quality.profile(df, Seq(
      Quality.rowCount(), Quality.nullCount("k"),
      Quality.futureDates("d", "2030-12-31")))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"profile must not join:\n$plan")
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      s"one aggregate exchange at most:\n$plan")
  }

  test("approxDistinct swaps in the bounded-memory variants, values " +
      "stay in the HLL band") {
    val m = metrics(approx = true)
    // Tiny cardinalities: HLL++ is exact here, but assert a band, not
    // equality, to document the contract being relied on.
    assert(math.abs(m("distinct_status") - 3L) <= 1)
    // Clamped at 0 by construction: HLL overestimation must never
    // read as a negative duplicate count.
    assert(m("dup_k") >= 0L && m("dup_k") <= 2L)
    assert(m("row_count") == 6L, "non-distinct rules are untouched")
  }

  test("an EMPTY batch profiles to all zeros, never NULL metrics") {
    val empty = df.filter(org.apache.spark.sql.functions.lit(false))
    val m = Quality.profile(empty, Seq(
        Quality.rowCount(),
        Quality.nullCount("k"),
        Quality.domainViolations("status", Seq("A", "B")),
        Quality.futureDates("d", "2030-12-31"),
        Quality.unparseableDates("d"),
        Quality.duplicateKeys("k")))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    m.foreach { case (k, v) =>
      assert(v == 0L, s"$k must be 0 on an empty batch, got $v " +
        "(a NULL here makes every value==0 load gate three-valued " +
        "on the day with no delta)")
    }
  }

  test("unparseableDates catches format-corrupted dates that nullCount " +
      "and futureDates are both blind to") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("d", StringType, nullable = true)))
    // All non-null, zero parse as ISO dates: the drifted-format batch.
    val drifted = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("31-12-1998"), Row("12/31/1998"), Row("not a date"))),
      schema)
    val m = Quality.profile(drifted, Seq(
        Quality.nullCount("d"),
        Quality.futureDates("d", "1998-12-31"),
        Quality.unparseableDates("d")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("null_d") == 0L && m("future_d") == 0L,
      "the blind rules see a clean batch")
    assert(m("unparseable_d") == 3L,
      "every value is unusable and only this rule says so")
  }

  test("approx duplicateKeys never goes negative, even at cardinalities " +
      "where HLL error is real") {
    import spark.implicits._
    // 50k distinct keys, zero duplicates: any HLL overestimate would
    // push count - estimate negative without the clamp.
    val big = (1L to 50000L).toDF("k")
    val v = Quality.profile(big, Seq(Quality.duplicateKeys("k")),
      approxDistinct = true).collect().head.getLong(1)
    assert(v >= 0L, s"clamp failed: dup_k = $v")
  }
}
