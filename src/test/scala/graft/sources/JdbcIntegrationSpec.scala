package graft.sources

import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.etl.Incremental

/** The reference's ENTIRE I/O layer is JDBC (subquery/partitioned/table
  * scans in, repartitioned appends out — `Load CT Patients Job/...`
  * `LoadCTPatients.java:49-57,162-169,205-215`). This suite drives
  * [[Jdbc]] end-to-end against embedded Derby (ships with Spark for
  * the Hive metastore, so it is on every Spark classpath): S1
  * subquery scan, S2 query scan, S3 range-partitioned scan, S4 table
  * scan, and S6 append — finishing with the reference's operational
  * loop: scan target → null-safe anti-join → append only new records,
  * run twice to prove idempotency. */
class JdbcIntegrationSpec extends SparkSpec with BeforeAndAfterAll {

  // In-memory Derby: unique name per run; derby.log routed to target/.
  private val dbName = s"graft_${System.nanoTime()}"
  private val url = s"jdbc:derby:memory:$dbName;create=true"
  private val conn = Jdbc.Conn(url, user = "app", password = "app",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  override def beforeAll(): Unit = {
    super.beforeAll()
    System.setProperty("derby.system.home", "target/derby")
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute(
      "CREATE TABLE patients (id INT NOT NULL, site INT, pname VARCHAR(32))")
    (1 to 10).foreach(i => st.execute(
      s"INSERT INTO patients VALUES ($i, ${1000 + i % 4}, 'p$i')"))
    st.execute(
      "CREATE TABLE patients_ods (id INT, site INT, pname VARCHAR(32))")
    // Target pre-seeded with 4 of the 10 source rows.
    (1 to 4).foreach(i => st.execute(
      s"INSERT INTO patients_ods VALUES ($i, ${1000 + i % 4}, 'p$i')"))
    st.close(); c.close()
  }

  test("S1 subquery scan pushes the derived-table SQL down") {
    val df = Jdbc.subqueryScan(spark, conn,
      "SELECT id, site FROM patients WHERE site > 1001", numPartitions = 1)
    assert(df.columns.toSeq == Seq("ID", "SITE"))
    assert(df.count() == 5) // sites 1002 (i%4==2: 3 rows) and 1003 (2 rows)
  }

  test("S2 query scan returns the pushed-down projection") {
    val ids = Jdbc.queryScan(spark, conn,
      "SELECT id FROM patients WHERE id <= 3")
      .collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == Seq(1, 2, 3))
  }

  test("S3 range-partitioned scan splits the key range without row loss") {
    val df = Jdbc.partitionedScan(spark, conn,
      "SELECT id, site, pname FROM patients",
      partitionColumn = "id", lowerBound = 1, upperBound = 10,
      numPartitions = 4)
    // Stride predicates must partition the domain: no loss, no dupes.
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select("ID").collect().map(_.getInt(0)).sorted.toSeq ==
      (1 to 10).toSeq)
  }

  test("S4 table scan reads the whole target") {
    assert(Jdbc.tableScan(spark, conn, "patients_ods").count() == 4)
  }

  test("S6 append + anti-join round-trip is idempotent (the reference loop)") {
    def load(): Long = {
      val source = Jdbc.subqueryScan(spark, conn,
        "SELECT id, site, pname FROM patients", numPartitions = 1)
      val target = Jdbc.tableScan(spark, conn, "patients_ods")
      val fresh = Incremental.newRecords(source, target, Seq("ID"))
      val n = fresh.count()
      if (n > 0) Jdbc.append(fresh, conn, "patients_ods", writePartitions = 2)
      n
    }
    assert(load() == 6)   // 10 source - 4 pre-seeded
    assert(Jdbc.tableScan(spark, conn, "patients_ods").count() == 10)
    assert(load() == 0)   // second run: nothing new -> idempotent
    assert(Jdbc.tableScan(spark, conn, "patients_ods").count() == 10)
  }

  test("streaming incrementalSinkJdbc: redelivered batches land each key exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("CREATE TABLE events_ods (id INT, v VARCHAR(16))")
    st.close(); c.close()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jdbc-ck").toString
    val ms = MemoryStream[(Int, String)]
    val q = graft.streaming.IncrementalStream.incrementalSinkJdbc(
      ms.toDF().toDF("id", "v"), conn, "events_ods", Seq("id"), ckpt,
      writePartitions = 1)
    ms.addData((1, "a"), (2, "b"))
    q.processAllAvailable()
    assert(Jdbc.tableScan(spark, conn, "events_ods").count() == 2)
    // At-least-once redelivery: the first batch arrives again plus one
    // genuinely new key — only the new key may reach the database.
    ms.addData((1, "a"), (2, "b"), (3, "c"))
    q.processAllAvailable()
    q.stop()
    val rows = Jdbc.tableScan(spark, conn, "events_ods").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq((1, "a"), (2, "b"), (3, "c")), s"got $rows")
  }

  test("S6 append preserves values through the JDBC round-trip") {
    val row = Jdbc.queryScan(spark, conn,
      "SELECT id, site, pname FROM patients_ods WHERE id = 7")
      .collect().head
    assert(row.getInt(0) == 7 && row.getInt(1) == 1003 &&
      row.getString(2) == "p7")
  }

  override def afterAll(): Unit = {
    // Drop the in-memory database; Derby signals success via SQLException.
    try DriverManager.getConnection(s"jdbc:derby:memory:$dbName;drop=true")
    catch { case _: java.sql.SQLException => () }
    super.afterAll()
  }
}
