package graft.tools

import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** Drives the [[RunJob]] CLI — the reference's spark-submit surface
  * (`LoadCTPatients.java:27-56`) — end-to-end against embedded Derby:
  * catalog key in, JDBC scan → clean → anti-join → PII hash → JDBC
  * append out, run twice to prove the operational loop is idempotent. */
class RunJobSpec extends SparkSpec with BeforeAndAfterAll {

  private val dbName = s"graft_runjob_${System.nanoTime()}"
  private val url = s"jdbc:derby:memory:$dbName;create=true"
  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  override def beforeAll(): Unit = {
    super.beforeAll()
    System.setProperty("derby.system.home", "target/derby")
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE ct_patient_src (
        |  SiteCode INT, PatientPK INT, PatientID VARCHAR(32),
        |  NUPI VARCHAR(32), PName VARCHAR(32))""".stripMargin
        .replaceAll("\n", " "))
    (1 to 10).foreach(i => st.execute(
      s"INSERT INTO ct_patient_src VALUES " +
        s"(${1000 + i % 3}, $i, 'pid$i', 'nupi$i', 'p$i')"))
    st.execute(
      """CREATE TABLE ct_patient_ods (
        |  SiteCode INT, PatientPK INT, PatientID VARCHAR(32),
        |  NUPI VARCHAR(32), PName VARCHAR(32),
        |  PatientIDHash VARCHAR(64), PatientPKHash VARCHAR(64),
        |  NUPIHash VARCHAR(64))""".stripMargin.replaceAll("\n", " "))
    // Target pre-seeded with 4 of the 10 identities (hash values are
    // irrelevant to the anti-join, which matches on SiteCode+PatientPK).
    (1 to 4).foreach(i => st.execute(
      s"INSERT INTO ct_patient_ods VALUES " +
        s"(${1000 + i % 3}, $i, 'pid$i', 'nupi$i', 'p$i', 'x', 'x', 'x')"))
    c.close()
  }

  override def afterAll(): Unit = {
    try DriverManager.getConnection(s"jdbc:derby:memory:$dbName;drop=true")
    catch { case _: java.sql.SQLException => () } // drop always "fails"
    super.afterAll()
  }

  private def odsCount(): Int = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery("SELECT count(*) FROM ct_patient_ods")
      rs.next(); rs.getInt(1)
    } finally c.close()
  }

  private def runOnce(): Unit = {
    // Materialize the suite session first: RunJob reuses a live
    // session when embedded (and must not stop it), building its own
    // only under spark-submit.
    assert(spark.sparkContext.isLocal)
    RunJob.main(Array("CT_Patient",
      "--source-jdbc", url, "app", "app", "ct_patient_src",
      "--target-jdbc", url, "app", "app", "ct_patient_ods",
      "--jdbc-driver", DerbyDriver,
      "--write-partitions", "2"))
  }

  test("one catalog job runs end-to-end over JDBC and is idempotent") {
    assert(odsCount() == 4)
    runOnce()
    assert(odsCount() == 10, "first run must append the 6 new identities")
    runOnce()
    assert(odsCount() == 10, "second run must append nothing")
    // The appended rows carry the engine-computed PII hashes.
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT NUPIHash FROM ct_patient_ods WHERE PatientPK = 7")
      rs.next()
      assert(rs.getString(1).matches("[0-9A-F]{64}"),
        "NUPIHash must be UPPER(SHA2-256)")
    } finally c.close()
  }

  test("--create-target bootstraps the ODS table from the engine's " +
      "output schema on a first run (the reference's DDL script, derived)") {
    assert(spark.sparkContext.isLocal)
    RunJob.main(Array("CT_Patient",
      "--source-jdbc", url, "app", "app", "ct_patient_src",
      "--target-jdbc", url, "app", "app", "ct_patient_fresh",
      "--jdbc-driver", DerbyDriver,
      "--create-target", "--write-partitions", "1"))
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT count(*) FROM ct_patient_fresh")
      rs.next()
      assert(rs.getInt(1) == 10, "bootstrap run must load all 10 rows")
      val rs2 = c.createStatement().executeQuery(
        "SELECT PatientPKHash FROM ct_patient_fresh WHERE PatientPK = 3")
      rs2.next()
      assert(rs2.getString(1).matches("[0-9A-F]{64}"))
    } finally c.close()
  }

  test("an unknown catalog key fails loudly with the known keys") {
    val e = intercept[IllegalArgumentException] {
      RunJob.main(Array("CT_Nope", "--source-parquet", "/tmp/x",
        "--target-parquet", "/tmp/y"))
    }
    assert(e.getMessage.contains("unknown catalog key") &&
      e.getMessage.contains("CT_Patient"))
  }
}
