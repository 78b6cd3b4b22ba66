package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** J5/W1 — latest-record dedup, including the reference-literal
  * independent-maxima semantics that can DROP a key entirely when the
  * max-ID row is not the max-date row (SURVEY §7.4 risk 2). */
class DedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("key", StringType, nullable = true),
    StructField("id", LongType, nullable = true),
    StructField("created", StringType, nullable = true)))

  private def df(rows: Seq[(String, java.lang.Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
      schema)

  test("latestPerKey keeps exactly one row per key, ties broken by id") {
    val d = df(Seq(
      ("a", 1L, "2024-01-01"), ("a", 2L, "2024-01-01"), // tie on date
      ("b", 5L, "2024-02-01"), ("b", 9L, "2024-01-01")))
    val out = Dedup.latestPerKey(d, Seq("key"), Seq("created", "id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("a" -> 2L, "b" -> 5L)) // b: later date wins over bigger id
  }

  test("maxFieldsDedup keeps rows matching BOTH independent maxima") {
    val d = df(Seq(
      ("a", 1L, "2024-01-02"),  // max created, not max id
      ("a", 2L, "2024-01-01"))) // max id, not max created
    // Reference-literal semantics: no row matches (max id AND max
    // created) simultaneously -> the key DROPS entirely.
    assert(Dedup.maxFieldsDedup(d, Seq("key"), Seq("id", "created")).count() == 0)
    // When one row holds both maxima it is kept (and only it).
    val d2 = df(Seq(("a", 2L, "2024-01-02"), ("a", 1L, "2024-01-01")))
    val kept = Dedup.maxFieldsDedup(d2, Seq("key"), Seq("id", "created")).collect()
    assert(kept.length == 1 && kept.head.getLong(1) == 2L)
  }

  test("maxFieldsDedup drops all-NULL partitions (T-SQL equality join)") {
    val d = df(Seq(("a", null, "2024-01-01"), ("a", null, "2024-01-02")))
    // max(id) is NULL; NULL = NULL is unknown in T-SQL -> key drops.
    assert(Dedup.maxFieldsDedup(d, Seq("key"), Seq("id")).count() == 0)
  }
}
