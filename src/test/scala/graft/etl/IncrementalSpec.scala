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

  test("upsert: existing keys replaced, absent kept, new inserted (SCD1 merge)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toFile
    val path = new java.io.File(dir, "t").getAbsolutePath
    Sink.upsert(spark, df(Seq((1L, "a"), (2L, "b"), (3L, "c"))), path, Seq("k1"))
    // Key 2 updated, key 4 inserted, keys 1/3 untouched.
    Sink.upsert(spark, df(Seq((2L, "B2"), (4L, "d"))), path, Seq("k1"))
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
    // Null keys merge null-safely: a null-key row is REPLACED, not duplicated.
    Sink.upsert(spark, df(Seq((null, "n1"))), path, Seq("k1"))
    Sink.upsert(spark, df(Seq((null, "n2"))), path, Seq("k1"))
    val nulls = spark.read.parquet(path).collect()
      .filter(_.isNullAt(0)).map(_.getString(1)).toSeq
    assert(nulls == Seq("n2"))
  }

  test("compact rewrites to the target file count, content-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toFile
    val path = new java.io.File(dir, "t").getAbsolutePath
    val data = df((1L to 500L).map(i => (Long.box(i), s"v$i")))
    data.repartition(10).write.parquet(path)
    val before = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet")) == 10)
    Sink.compact(spark, path, 2)
    assert(new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet")) == 2)
    val after = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(after == before)
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

  test("strictKeys component uses `=`: null-key rows re-insert forever " +
      "(LoadMNCHImmunization.java:67-68 literal parity)") {
    val source = df(Seq((1L, "a"), (null, "b")))
    val target = df(Seq((1L, "a"), (null, "b"))) // both already loaded
    // default (all <=>): nothing is new
    assert(Incremental.newRecords(source, target, Seq("k1", "k2")).count() == 0)
    // reference-literal mode for k1: NULL = NULL is not true, so the
    // null-k1 row never matches the target and re-inserts every run
    val strict = Incremental.newRecords(source, target, Seq("k1", "k2"),
      strictKeys = Set("k1")).collect()
    assert(strict.length == 1 && strict.head.isNullAt(0))
  }

  test("fullRefresh recovers from a stale __old left by a prior crash") {
    val dir = java.nio.file.Files.createTempDirectory("graft-refresh2").toFile
    val path = new java.io.File(dir, "t").getAbsolutePath
    Sink.fullRefresh(df(Seq((1L, "a"))), path)
    // simulate a crash that left __old behind
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(path + "__old"))
    Sink.fullRefresh(df(Seq((2L, "b"), (3L, "c"))), path)
    assert(spark.read.parquet(path).count() == 2)
    assert(!new java.io.File(path + "__old").exists())
  }

  test("incrementalLoad executes the upstream plan ONCE across count+append") {
    val dir = java.nio.file.Files.createTempDirectory("graft-once").toFile
    val path = new java.io.File(dir, "t").getAbsolutePath
    // seed the target so the anti-join path (exists=true) is exercised
    Sink.incrementalLoad(spark, df(Seq((1L, "a"))), path, Seq("k1", "k2"))
    val evals = spark.sparkContext.longAccumulator("graft-probe-evals")
    val probeUdf = org.apache.spark.sql.functions.udf { (k: java.lang.Long) =>
      evals.add(1L); k
    }.asNondeterministic()
    val source = df(Seq((1L, "a"), (2L, "b"), (3L, "c")))
      .withColumn("k1", probeUdf(org.apache.spark.sql.functions.col("k1")))
    assert(Sink.incrementalLoad(spark, source, path, Seq("k1", "k2")) == 2)
    // Without the DISK_ONLY pin the clean+anti-join plan would run twice
    // (once for count, once for append) and the probe would fire ~2x.
    assert(evals.value == 3L,
      s"upstream plan evaluated ${evals.value} source rows; expected 3 (one pass)")
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
