package graft.jobs

import java.time.LocalDate

import graft.SparkSpec

/** Sanity for the transcribed reference job catalog and one end-to-end
  * run of a family spec. */
class ReferenceJobsSpec extends SparkSpec {

  import spark.implicits._

  test("anti-join key catalog covers all 51 incremental targets") {
    // 52 job modules = these 51 anti-join loads + the Historical ART
    // truncate-and-rebuild (no anti-join key; covered by
    // cohort/ArtOutcomes + Sink.fullRefresh).
    assert(ReferenceJobs.antiJoinKeys.size == 51)
    // Every key list is non-empty and leads with the patient/site or
    // surrogate identity.
    assert(ReferenceJobs.antiJoinKeys.values.forall(_.nonEmpty))
    // Spot-checks against SURVEY Appendix A citations.
    assert(ReferenceJobs.antiJoinKeys("CT_PatientVisits") ==
      Seq("PatientPK", "SiteCode", "VisitID"))
    assert(ReferenceJobs.antiJoinKeys("MNCH_Labs") ==
      Seq("PatientPk", "SiteCode", "VisitID", "TestName", "TestResult"))
    assert(ReferenceJobs.antiJoinKeys("CT_IITRiskScores") == Seq("ID"))
  }

  test("htsClients spec runs end-to-end on an HTS-shaped frame") {
    val source = Seq(
      (1L, 100L, 200L, "1985-01-01", "0", "M", "married", "2024-01-01"),
      (2L, 100L, 200L, "1985-01-01", "1", "M", "married", "2024-02-01"), // newer
      (3L, 101L, 201L, "1840-01-01", "1", "F", "single", "2024-01-01"))
      .toDF("ID", "SiteCode", "PatientPK", "Dob", "EverTestedForHiv",
        "Gender", "MaritalStatus", "DateExtracted")
      .withColumn("HtsNumber", $"PatientPK" + 9000)
    val lkp = Seq(("married", "Married"), ("single", "Single"))
      .toDF("source_name", "target_name")
    val spec = ReferenceJobs.htsClients(LocalDate.of(2026, 1, 1), lkp)
    val out = Job.transform(source, spec).collect()
      .map(r => r.getAs[Long]("PatientPK") -> r).toMap
    assert(out.size == 2) // (100,200) collapsed to the newer extract
    assert(out(200L).getAs[String]("EverTestedForHiv") == "Yes")
    assert(out(200L).getAs[String]("Gender") == "Male")
    assert(out(200L).getAs[String]("MaritalStatus") == "Married")
    // 1840 DOB clamped to the sentinel.
    assert(out(201L).getAs[java.sql.Date]("Dob").toString == "1900-01-01")
  }
}
