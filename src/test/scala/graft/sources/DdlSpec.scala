package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** [[Ddl]] — schema-derived target DDL: SQL Server text matches the
  * reference's script conventions, the Derby dialect EXECUTES and then
  * accepts the engine's own append, ensureTable is idempotent. */
class DdlSpec extends SparkSpec with BeforeAndAfterAll {

  import spark.implicits._

  private val dbName = s"graft_ddl_${System.nanoTime()}"
  private val url = s"jdbc:derby:memory:$dbName;create=true"
  private val conn = Jdbc.Conn(url, "app", "app",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  override def beforeAll(): Unit = {
    super.beforeAll()
    System.setProperty("derby.system.home", "target/derby")
    DriverManager.getConnection(url).close()
  }

  override def afterAll(): Unit = {
    try DriverManager.getConnection(s"jdbc:derby:memory:$dbName;drop=true")
    catch { case _: java.sql.SQLException => () }
    super.afterAll()
  }

  private val schema = StructType(Seq(
    StructField("SiteCode", LongType),
    StructField("PatientPK", LongType, nullable = false),
    StructField("PName", StringType),
    StructField("VisitDate", DateType),
    StructField("Score", DoubleType),
    StructField("Flag", BooleanType)))

  test("sqlserver dialect matches the reference's script conventions " +
      "(bracketed dbo identifiers, nullable generous varchars)") {
    val ddl = Ddl.createTable(schema, "CT_PatientVisits")
    assert(ddl.startsWith("CREATE TABLE [dbo].[CT_PatientVisits]"), ddl)
    assert(ddl.contains("[PName] VARCHAR(MAX)"), ddl)
    assert(ddl.contains("[VisitDate] DATE"), ddl)
    assert(ddl.contains("[PatientPK] BIGINT NOT NULL"), ddl)
    assert(ddl.contains("[Flag] BIT"), ddl)
  }

  test("array/struct columns fail loudly with the projection hint") {
    val bad = StructType(Seq(
      StructField("v", ArrayType(FloatType))))
    val e = intercept[IllegalArgumentException] {
      Ddl.createTable(bad, "t", "derby")
    }
    assert(e.getMessage.contains("no JDBC DDL mapping"), e.getMessage)
  }

  test("derby DDL executes; the engine's own append then fits the " +
      "created table; ensureTable is idempotent") {
    assert(Ddl.ensureTable(conn, "ddl_target", schema, "derby"),
      "first ensure must create")
    assert(!Ddl.ensureTable(conn, "ddl_target", schema, "derby"),
      "second ensure must no-op")
    val df = Seq(
      (1000L, 1L, "p1", java.sql.Date.valueOf("2024-01-02"), 0.5, true),
      (1000L, 2L, "p2", java.sql.Date.valueOf("2024-02-03"), 1.5, false))
      .toDF("SiteCode", "PatientPK", "PName", "VisitDate", "Score", "Flag")
    Jdbc.append(df, conn, "ddl_target", writePartitions = 1)
    val back = Jdbc.tableScan(spark, conn, "ddl_target")
    assert(back.count() == 2)
    // Derby case-normalizes unquoted identifiers to UPPER.
    assert(back.schema.fieldNames.map(_.toUpperCase).toSet ==
      schema.fieldNames.map(_.toUpperCase).toSet)
  }
}
