package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale.
  *
  * AQE's runtime skew-join splitting handles most cases; these helpers
  * cover the two patterns AQE cannot: a single hot GROUP BY key whose
  * partial aggregate still lands on one reducer, and a shuffle join
  * whose hot build-side key must be replicated. Salting is
  * deterministic (hash of a tiebreak column, not rand()) so results
  * are reproducible and retries are safe — rand() in a salted pipeline
  * breaks task-retry idempotency.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (keys + salt) for the heavy
    * partial, then re-aggregate by keys. `aggs` must be decomposable
    * (sum/count/min/max — the reference only uses these, SURVEY §2.5).
    *
    * Example: saltedAgg(df, Seq("k"), col("id"), 16)(
    *   "cnt" -> (count(lit(1)), sum(_)), "mx" -> (max(col("v")), max(_))) */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltSource: Column,
      saltBuckets: Int)(
      aggs: (String, (Column, Column => Column))*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, (p, _)) => p.as(s"__p_$n") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, (_, f)) => f(col(s"__p_$n")).as(n) }: _*)
  }

  /** Salted equi-join for a skewed probe side: the probe rows get a
    * deterministic salt in [0, buckets); the build side is replicated
    * once per salt value. Join key becomes (key, salt). Use when ONE
    * side is small enough to replicate but too big (or too skewed) to
    * broadcast outright. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltSource: Column, buckets: Int, joinType: String = "inner"): DataFrame = {
    val p = probe.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
    val b = build
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
      .withColumnRenamed(key, s"__b_$key")
    p.join(b, p("__salt") === b("__salt") && p(key) === col(s"__b_$key"), joinType)
      .drop("__salt", s"__b_$key")
  }
}
