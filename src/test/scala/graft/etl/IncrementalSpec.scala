package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** J3 — null-safe anti-join semantics (SURVEY §7.4 risk 1: a `===`
  * anti-join silently re-inserts rows with null key components on
  * every run; the reference uses `<=>` everywhere for this reason). */
class IncrementalSpec extends SparkSpec {

  private def df(rows: Seq[(java.lang.Long, String)]) = {
    val schema = StructType(Seq(
      StructField("k1", LongType, nullable = true),
      StructField("k2", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
  }

  test("rows with null key components already in target are NOT re-inserted") {
    val source = df(Seq((1L, "a"), (null, "b"), (2L, null), (3L, "c")))
    val target = df(Seq((1L, "a"), (null, "b"), (2L, null)))
    val fresh = Incremental.newRecords(source, target, Seq("k1", "k2"))
      .collect()
    assert(fresh.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("empty target passes everything through") {
    val source = df(Seq((1L, "a"), (null, "b")))
    val target = df(Seq.empty)
    assert(Incremental.newRecords(source, target, Seq("k1", "k2")).count() == 2)
  }

  test("duplicate target keys do not duplicate source rows") {
    val source = df(Seq((1L, "a"), (2L, "b")))
    val target = df(Seq((1L, "a"), (1L, "a"), (1L, "a")))
    val fresh = Incremental.newRecords(source, target, Seq("k1", "k2"))
    assert(fresh.count() == 1)
    assert(fresh.collect().head.getLong(0) == 2L)
  }

  test("fullRefresh swaps the target atomically (S7 rename/drop analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-refresh").toFile
    val path = new java.io.File(dir, "t").getAbsolutePath
    Sink.fullRefresh(df(Seq((1L, "a"), (2L, "b"), (3L, "c"))), path)
    assert(spark.read.parquet(path).count() == 3)
    Sink.fullRefresh(df(Seq((9L, "z"), (8L, "y"))), path)
    val rows = spark.read.parquet(path).collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(8L, 9L))
    assert(!new java.io.File(path + "__staging").exists())
    assert(!new java.io.File(path + "__old").exists())
  }

  test("second run is a no-op (idempotent load via Sink)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toFile
    val path = new java.io.File(dir, "t").getAbsolutePath
    val source = df(Seq((1L, "a"), (null, "b"), (2L, null)))
    assert(Sink.incrementalLoad(spark, source, path, Seq("k1", "k2")) == 3)
    assert(Sink.incrementalLoad(spark, source, path, Seq("k1", "k2")) == 0)
    val extended = df(Seq((1L, "a"), (null, "b"), (2L, null), (9L, "z")))
    assert(Sink.incrementalLoad(spark, extended, path, Seq("k1", "k2")) == 1)
    assert(spark.read.parquet(path).count() == 4)
  }
}
