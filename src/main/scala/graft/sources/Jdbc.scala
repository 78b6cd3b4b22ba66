package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink surface — SURVEY §2.1 S1-S6.
  *
  * The reference reads every table over JDBC from SQL Server and
  * appends results back over JDBC. This engine runs its oracle-checked
  * parity suite over parquet (driver contract), but the JDBC operator
  * surface is part of the reference's API and is preserved here as a
  * thin, fully-wired layer over `spark.read.format("jdbc")`:
  *
  *  - S1 subquery scan: pushed-down SQL as a derived table
  *    (`Load CT Patients Job/.../LoadCTPatients.java:49-57`)
  *  - S2 query scan: the `query` option
  *    (`Load HTS Client Tests/.../LoadHtsClientTests.java:47-55`)
  *  - S3 range-partitioned scan: partitionColumn/lowerBound/upperBound
  *    (`Load CT Patient Visits/.../LoadPatientVisits.java:47-51`)
  *  - S4 table scan (`LoadCTPatients.java:162-169`)
  *  - S5 lookup scan = S2 over a 2-column dim
  *    (`Load CT ART Patients/.../LoadARTPatients.java:68-76`)
  *  - S6 append sink: repartition + mode(Append)
  *    (`LoadCTPatients.java:205-215`)
  *
  * Scale notes: `numPartitions` bounds both scan parallelism and sink
  * connection count; the range-partitioned scan is the only way to
  * parallelize a JDBC read without a pushed-down split column, and its
  * bounds should cover the real key domain (the reference hardcodes
  * SiteCode in [10019, 28742]). The layer is exercised end-to-end by
  * `JdbcIntegrationSpec` against embedded Derby (scan variants, the
  * append sink, and the scan → anti-join → append idempotency loop);
  * the oracle-checked parity suite runs over parquet equivalents in
  * [[graft.Tables]].
  */
object Jdbc {

  final case class Conn(url: String, user: String, password: String,
      driver: String = "com.microsoft.sqlserver.jdbc.SQLServerDriver")

  private def base(spark: SparkSession, conn: Conn) =
    spark.read.format("jdbc")
      .option("url", conn.url)
      .option("user", conn.user)
      .option("password", conn.password)
      .option("driver", conn.driver)

  /** S1 — pushed-down SQL as a derived table. */
  def subqueryScan(spark: SparkSession, conn: Conn, sql: String,
      numPartitions: Int): DataFrame =
    base(spark, conn)
      .option("dbtable", s"( $sql ) as source")
      .option("numPartitions", numPartitions)
      .load()

  /** S2/S5 — pushed-down SQL via the `query` option. */
  def queryScan(spark: SparkSession, conn: Conn, sql: String): DataFrame =
    base(spark, conn).option("query", sql).load()

  /** S3 — range-partitioned parallel scan. */
  def partitionedScan(spark: SparkSession, conn: Conn, sql: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    base(spark, conn)
      .option("dbtable", s"( $sql ) as source")
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** S4 — plain table scan (target side of the anti-join). */
  def tableScan(spark: SparkSession, conn: Conn, table: String): DataFrame =
    base(spark, conn).option("dbtable", table).load()

  /** S6 — append write with bounded connection count. */
  def append(df: DataFrame, conn: Conn, table: String,
      writePartitions: Int = 50): Unit =
    df.repartition(writePartitions)
      .write.format("jdbc")
      .option("url", conn.url)
      .option("user", conn.user)
      .option("password", conn.password)
      .option("driver", conn.driver)
      .option("dbtable", table)
      .mode(SaveMode.Append)
      .save()
}
