package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Bucketing]]: the co-location contract, machine-asserted — the
  * bucketed fact x fact join plans with ZERO shuffle exchanges while
  * the identical plain-parquet join exchanges both sides, and the
  * results are equal. */
class BucketedJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dirs: (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft-bkt-spec")
    val facts = (1L to 2000L).map(i => (i % 97, i, s"p${i % 5}"))
      .toDF("key", "val", "tag")
    val dims = (0L until 97L).map(k => (k, k * 10)).toDF("key", "weight")
    facts.write.parquet(s"$base/facts")
    dims.write.parquet(s"$base/dims")
    Bucketing.writeBucketed(spark.read.parquet(s"$base/facts"),
      "graft_spec_facts", s"$base/bfacts", "key", 4)
    Bucketing.writeBucketed(spark.read.parquet(s"$base/dims"),
      "graft_spec_dims", s"$base/bdims", "key", 4)
    (s"$base/facts", s"$base/dims")
  }

  test("co-bucketed join plans with zero shuffle exchanges") {
    val (factsDir, dimsDir) = dirs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val bucketed = Bucketing.bucketedJoin(spark,
        "graft_spec_facts", "graft_spec_dims", "key", "key")
      val bPlan = bucketed.queryExecution.executedPlan.toString()
      assert(bPlan.contains("SortMergeJoin"), bPlan)
      assert(!bPlan.contains("Exchange"),
        s"bucketed join still shuffles:\n$bPlan")

      val plain = spark.read.parquet(factsDir).as("f")
        .join(spark.read.parquet(dimsDir).as("d"), Seq("key"))
      val pPlan = plain.queryExecution.executedPlan.toString()
      assert(pPlan.contains("Exchange"),
        s"control plan unexpectedly shuffle-free:\n$pPlan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed join result equals the plain join") {
    val (factsDir, dimsDir) = dirs
    val bucketed = Bucketing.bucketedJoin(spark,
        "graft_spec_facts", "graft_spec_dims", "key", "key")
      .select($"val", $"tag", $"weight")
    val plain = spark.read.parquet(factsDir)
      .join(spark.read.parquet(dimsDir), Seq("key"))
      .select($"val", $"tag", $"weight")
    assert(bucketed.except(plain).isEmpty && plain.except(bucketed).isEmpty &&
      bucketed.count() == plain.count())
  }

  test("writeBucketed overwrite is idempotent (re-layout, same rows)") {
    val (factsDir, _) = dirs
    Bucketing.writeBucketed(spark.read.parquet(factsDir),
      "graft_spec_facts2", s"${java.nio.file.Files.createTempDirectory("graft-bkt2")}/f",
      "key", 4)
    Bucketing.writeBucketed(spark.read.parquet(factsDir),
      "graft_spec_facts2", s"${java.nio.file.Files.createTempDirectory("graft-bkt3")}/f",
      "key", 4)
    assert(spark.table("graft_spec_facts2").count() == 2000L)
  }
}
