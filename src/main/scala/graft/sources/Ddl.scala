package graft.sources

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.types._

/** Target-table DDL management for the JDBC sink path — the surface
  * the reference ships as a hand-maintained script per job
  * (`Load CT Patient Visits/src/main/resources/PatientVisitsDDL.sql:1-78`:
  * bracketed [dbo].[CT_PatientVisits] with nullable varchar/date
  * columns). This engine derives the DDL from the batch SCHEMA instead
  * — the same frame [[graft.etl.SchemaDrift.conform]] enforces on
  * append — so table shape and engine output cannot drift apart, and
  * a first run against an empty database can create its own target
  * (`RunJob --create-target`).
  *
  * Dialects: `sqlserver` (the reference's deployment form, bracketed
  * identifiers, varchar(max)/datetime2) and `derby` (the in-sandbox
  * e2e surface; plain identifiers, standard SQL types). Everything is
  * driver-side string generation — no Spark jobs, no data movement.
  */
object Ddl {

  /** One column's SQL type in the dialect. VARCHAR sizing follows the
    * reference's convention of generous nullable varchars; Derby caps
    * VARCHAR at 32672 so "max" maps below that. */
  private def sqlType(dt: DataType, dialect: String): String = (dt, dialect) match {
    case (LongType, _)                 => "BIGINT"
    case (IntegerType, _)              => "INT"
    case (ShortType, _)                => "SMALLINT"
    case (ByteType, "sqlserver")       => "TINYINT"
    case (ByteType, _)                 => "SMALLINT"
    case (DoubleType, "sqlserver")     => "FLOAT"
    case (DoubleType, _)               => "DOUBLE"
    case (FloatType, _)                => "REAL"
    case (BooleanType, "sqlserver")    => "BIT"
    case (BooleanType, _)              => "BOOLEAN"
    case (StringType, "sqlserver")     => "VARCHAR(MAX)"
    case (StringType, _)               => "VARCHAR(4000)"
    case (DateType, _)                 => "DATE"
    case (TimestampType, "sqlserver")  => "DATETIME2"
    case (TimestampType, _)            => "TIMESTAMP"
    case (BinaryType, "sqlserver")     => "VARBINARY(MAX)"
    case (BinaryType, _)               => "BLOB"
    case (d: DecimalType, _)           => s"DECIMAL(${d.precision},${d.scale})"
    case (other, _) => throw new IllegalArgumentException(
      s"no JDBC DDL mapping for ${other.simpleString} — project it to a " +
        "scalar column before the sink (arrays/structs/maps are " +
        "parquet-path types)")
  }

  // SQL Server gets the reference's bracketed identifiers; Derby (and
  // other standard-SQL targets) get PLAIN identifiers — quoting would
  // store them case-sensitively while the probe, Spark's JDBC INSERT,
  // and ad-hoc SQL all use unquoted (case-normalized) names.
  private def quote(name: String, dialect: String): String = dialect match {
    case "sqlserver" => s"[$name]"
    case _           => name
  }

  /** CREATE TABLE statement for `schema` in the dialect — the
    * generated equivalent of the reference's per-job DDL script.
    * Columns are NULLable like the reference's (the load path's
    * cleaning, not the table, enforces domain rules). */
  def createTable(schema: StructType, table: String,
      dialect: String = "sqlserver"): String = {
    require(schema.fields.nonEmpty, "empty schema")
    val d = dialect.toLowerCase
    val cols = schema.fields.map { f =>
      s"    ${quote(f.name, d)} ${sqlType(f.dataType, d)}" +
        (if (f.nullable) "" else " NOT NULL")
    }.mkString(",\n")
    val qualified = d match {
      case "sqlserver" => s"[dbo].${quote(table, d)}"
      case _           => quote(table, d)
    }
    s"CREATE TABLE $qualified (\n$cols\n)"
  }

  /** Create the target over JDBC when it does not exist; no-op when it
    * does. Existence is probed with a zero-row select rather than
    * dialect-specific catalog views. Returns true when created. */
  def ensureTable(conn: Jdbc.Conn, table: String, schema: StructType,
      dialect: String): Boolean = {
    Class.forName(conn.driver)
    val c: Connection =
      DriverManager.getConnection(conn.url, conn.user, conn.password)
    try {
      val exists =
        try {
          val st = c.createStatement()
          try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0"); true }
          finally st.close()
        } catch { case _: java.sql.SQLException => false }
      if (!exists) {
        val st = c.createStatement()
        try st.execute(createTable(schema, table, dialect))
        finally st.close()
      }
      !exists
    } finally c.close()
  }
}
