package graft

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Cleaning, Dedup, Incremental, LookupRemap, PiiHash}
import graft.queries.{CleaningQueries, CohortQueries, EtlQueries, PipelineQueries, SimQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + TESTDATA.md.
  *
  * `queries` holds one named entry per implemented operator from
  * SURVEY.md §2 (plus the training-data-pipeline operators); `oracleSql`
  * holds the DuckDB-equivalent ANSI SQL for every SQL-expressible one.
  * Column names are aligned between both sides — the driver sorts
  * columns by name before hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Runs the reference's complete incremental-load pipeline
    * shape (SURVEY §3.1): scan -> expression cleaning -> vocabulary
    * canonicalization -> lookup remap -> latest-record dedup ->
    * null-safe anti-join against the loaded target -> PII hash ->
    * explicit output projection. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val nation = Tables.nation(spark, dir)

    val cleaned = orders
      .withColumn("o_orderdate",
        Cleaning.clampDate(LocalDate.of(1995, 1, 1), LocalDate.of(2002, 1, 1))(
          col("o_orderdate").cast("date")))
      .withColumn("o_orderpriority",
        Cleaning.canonicalize(Seq(
          Seq("1-URGENT", "2-HIGH") -> "HIGH",
          Seq("3-MEDIUM") -> "MEDIUM",
          Seq("4-NOT SPECIFIED", "5-LOW") -> "LOW"))(col("o_orderpriority")))
      .withColumn("o_orderstatus",
        Cleaning.recode(Map("O" -> "Open", "F" -> "Finished", "P" -> "Pending"))(
          col("o_orderstatus")))

    val lkp = nation.select(col("n_name").as("source_name"),
      upper(col("n_name")).as("target_name"))
    val remapped = LookupRemap.remap(
      cleaned.withColumn("priority_src", col("o_orderpriority")), lkp,
      "priority_src") // miss-path: priorities are not nation names

    val latest = Dedup.latestPerKey(remapped, Seq("o_custkey"),
      Seq("o_orderdate", "o_orderkey"))
    val target = latest.filter(col("o_orderkey") % 10 < 8)
    val fresh = Incremental.newRecords(latest, target,
      Seq("o_custkey", "o_orderkey"))

    PiiHash.hashColumns(fresh, Seq("o_custkey"))
      .select(col("o_orderkey"), col("o_custkeyHash"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_orderdate"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlQueries.queries ++ CleaningQueries.queries ++ CohortQueries.queries ++
      TextQueries.queries ++ SimQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    EtlQueries.oracles ++ CleaningQueries.oracles ++ CohortQueries.oracles ++
      TextQueries.oracles ++ SimQueries.oracles ++ PipelineQueries.oracles
}
