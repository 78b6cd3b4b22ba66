package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{Dedup, Incremental, PiiHash}

/** Operator-parity queries over the driver's TPC-H-ish parquet tables
  * (role mapping per /root/repo/FIXTURES.md §B). Each entry here has a
  * DuckDB oracle in [[EtlQueries.oracles]]; names and output column
  * names must match the oracle exactly (driver sorts columns by name
  * before hashing).
  */
object EtlQueries {

  /** Derived nullable key used to exercise null-safe (`<=>`) semantics:
    * the testdata has no NULL keys, so we null out a deterministic
    * slice, mirrored exactly in the oracle SQL. */
  private def nullableCustkey(df: DataFrame) =
    when(col("o_custkey") % 11 === 0, lit(null)).otherwise(col("o_custkey"))

  /** J3 — incremental anti-join (SURVEY §2.4 J3): source minus target on
    * a null-safe composite key. Target = the deterministic "already
    * loaded" 80% slice. */
  def incrementalAntijoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val source = orders
      .withColumn("cust_k", nullableCustkey(orders))
    val target = source.filter(col("o_orderkey") % 10 < 8)
    Incremental.newRecords(source, target, Seq("cust_k", "o_orderkey"))
      .select(
        col("o_orderkey"), col("cust_k"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
  }

  /** J5/W1 — latest-record-per-key dedup via window row_number. */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
    Dedup.latestPerKey(li, Seq("l_orderkey", "l_partkey"),
        Seq("l_shipdate", "l_linenumber"))
      .select(
        col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_shipdate"),
        col("l_quantity").cast("decimal(18,2)").as("l_quantity"))
  }

  /** A1/A2 — grouped aggregation (decimal-cast so Spark and DuckDB sums
    * are exact and bit-identical). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_price"),
        min(col("l_shipdate").cast("date")).as("min_ship"),
        max(col("l_shipdate").cast("date")).as("max_ship"))

  /** E9/U1 — PII hash: UPPER(SHA2-256(string form)). */
  def piiHash(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name")
    PiiHash.hashColumns(c, Seq("c_custkey", "c_name"))
      .select("c_custkey", "c_custkeyHash", "c_nameHash")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "incremental_antijoin" -> (incrementalAntijoin _),
    "latest_per_key"       -> (latestPerKey _),
    "pricing_summary"      -> (pricingSummary _),
    "pii_hash"             -> (piiHash _)
  )

  val oracles: Map[String, String] = Map(
    "incremental_antijoin" ->
      """WITH src AS (
        |  SELECT *, CASE WHEN o_custkey % 11 = 0 THEN NULL ELSE o_custkey END AS cust_k
        |  FROM orders
        |), tgt AS (
        |  SELECT * FROM src WHERE o_orderkey % 10 < 8
        |)
        |SELECT s.o_orderkey, s.cust_k, s.o_orderstatus,
        |       CAST(s.o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
        |       CAST(s.o_orderdate AS DATE) AS o_orderdate,
        |       s.o_orderpriority
        |FROM src s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM tgt t
        |  WHERE s.cust_k IS NOT DISTINCT FROM t.cust_k
        |    AND s.o_orderkey IS NOT DISTINCT FROM t.o_orderkey
        |)""".stripMargin,
    "latest_per_key" ->
      """SELECT l_orderkey, l_partkey, l_linenumber,
        |       CAST(l_shipdate AS DATE) AS l_shipdate,
        |       CAST(l_quantity AS DECIMAL(18,2)) AS l_quantity
        |FROM (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY l_orderkey, l_partkey
        |      ORDER BY CAST(l_shipdate AS DATE) DESC, l_linenumber DESC
        |    ) AS rn
        |  FROM lineitem
        |) WHERE rn = 1""".stripMargin,
    "pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price,
        |       min(CAST(l_shipdate AS DATE)) AS min_ship,
        |       max(CAST(l_shipdate AS DATE)) AS max_ship
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "pii_hash" ->
      """SELECT c_custkey,
        |       upper(sha256(CAST(c_custkey AS VARCHAR))) AS c_custkeyHash,
        |       upper(sha256(c_name)) AS c_nameHash
        |FROM customer""".stripMargin
  )
}
