package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants + plan audits for the training-data curation operators
  * (their value parity vs DuckDB is the driver's CORRECTNESS gate;
  * these tests pin the semantic invariants and the at-scale plan
  * shapes). */
class PipelineQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame = graft.Tables.documents(spark, dir)

  test("repetition_stats covers every document with fractions in [0, 1e6]") {
    val r = PipelineQueries.repetitionStats(spark, dir).cache()
    try {
      assert(r.count() == docs.count())
      assert(r.filter(col("frac_dup_2gram_c") < 0 ||
        col("frac_dup_2gram_c") > 1000000L ||
        col("frac_top_2gram_c") < 0 ||
        col("frac_top_2gram_c") > 1000000L).count() == 0)
      // A doc with no repeated 2-gram must keep; a fully-repetitive
      // doc must drop. Both exist by construction below.
      import spark.implicits._
      val synth = Seq((1L, "a b c d e f g"), (2L, ("x y " * 50).trim))
        .toDF("doc_id", "text")
      val grams = synth.select(col("doc_id"),
          explode(graft.text.TextFunctions.wordNgrams(
            graft.text.TextFunctions.tokens(col("text")), 2)).as("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(sum("count").as("total"), count(lit(1)).as("nd"))
        .collect().map(r0 => r0.getLong(0) -> (r0.getLong(1), r0.getLong(2)))
        .toMap
      assert(grams(1L)._1 == grams(1L)._2)     // all distinct -> keep
      assert(grams(2L)._2.toDouble / grams(2L)._1 < 0.1) // heavy dup -> drop
    } finally r.unpersist()
  }

  test("repetition_stats plans as hash aggregations, no window, no cartesian") {
    val plan = PipelineQueries.repetitionStats(spark, dir)
      .queryExecution.sparkPlan.toString()
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("decontaminate: eval slice excluded, eval-gram join is broadcast") {
    val d = PipelineQueries.decontaminate(spark, dir).cache()
    try {
      assert(d.filter(col("doc_id") % 97 === 0).count() == 0)
      assert(d.filter(col("contaminated") === 1L &&
        col("n_hit_grams") === 0L).count() == 0)
      assert(d.filter(col("contaminated") === 0L &&
        col("n_hit_grams") > 0L).count() == 0)
      val plan = PipelineQueries.decontaminate(spark, dir)
        .queryExecution.sparkPlan.toString()
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally d.unpersist()
  }

  test("pack_sequences: offsets are exclusive prefix sums; bins contiguous per shard") {
    val p = PipelineQueries.packSequences(spark, dir).cache()
    try {
      assert(p.count() == docs.count())
      // Within each (lang, shard), recomputing the running sum in doc_id
      // order must reproduce start_off exactly.
      val rows = p.orderBy(col("lang"), col("shard"), col("doc_id"))
        .collect()
        .groupBy(r => (r.getString(1), r.getLong(2)))
      rows.foreach { case ((lang, shard), rs) =>
        var acc = 0L
        rs.foreach { r =>
          assert(r.getLong(4) == acc, s"start_off mismatch in ($lang,$shard)")
          assert(r.getLong(5) == acc / 2048L, s"bin mismatch in ($lang,$shard)")
          acc += r.getLong(3)
        }
      }
      // Shard assignment is a pure function of doc_id: rerunning yields
      // identical shard values (reproducibility contract).
      val again = PipelineQueries.packSequences(spark, dir)
        .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      p.select("doc_id", "shard").collect()
        .foreach(r => assert(again(r.getLong(0)) == r.getLong(1)))
    } finally p.unpersist()
  }
}
