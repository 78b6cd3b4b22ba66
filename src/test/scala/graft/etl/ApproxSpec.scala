package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The approximate sketches that replace corpus_profile's exact
  * aggregates at 100 TB (HLL++ distinct counts, t-digest-ish
  * percentiles): sanity vs exact within published error bounds.
  * (Sketch internals differ per engine, so these are test-verified,
  * not DuckDB-oracle-checked.) */
class ApproxSpec extends SparkSpec {

  import spark.implicits._

  private def df = (1 to 20000).map(i => (i.toLong % 5000, i.toDouble))
    .toDF("k", "v")

  test("approx_count_distinct within 5% of exact") {
    val row = df.agg(
      countDistinct(col("k")).as("exact"),
      approx_count_distinct(col("k"), 0.02).as("approx")).collect().head
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val row = df.agg(
      expr("percentile(v, 0.5)").as("exact"),
      expr("approx_percentile(v, 0.5, 1000)").as("approx")).collect().head
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
