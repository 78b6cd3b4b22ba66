package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.functions._

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

  test("ctArtPatients spec: DOB 1900 floor, triple regimen self-remap, age clamps") {
    val today = LocalDate.of(2026, 1, 1)
    val source = Seq(
      (1L, 100L, 10L, "1950-06-01", "1979-12-31", "reg-old", "reg-old", "keep-me",
        "Open Medical Records System - OpenMRS", "CHAP Uzima", 130, "exit-old", "2024-01-01"),
      (2L, 100L, 11L, "1899-12-31", "2024-01-01", "r2", "reg-old", "reg-old",
        "Other EMR", "Ampathplus", 42, "none", "2024-01-01"))
      .toDF("ID", "SiteCode", "PatientPK", "DOB", "StartARTDate",
        "PreviousARTRegimen", "StartRegimen", "LastRegimen", "Emr", "Project",
        "AgeARTStart", "ExitReason", "Created")
      .withColumn("PatientID", $"PatientPK" + 7000)
      .withColumn("StartARTAtThisFacility", lit("2024-01-01"))
      .withColumn("LastARTDate", lit("2024-01-01"))
      .withColumn("RegistrationDate", lit("2024-01-01"))
      .withColumn("PreviousARTStartDate", lit("2024-01-01"))
      .withColumn("ExpectedReturn", lit("2024-01-01"))
      .withColumn("LastVisit", lit("2024-01-01"))
      .withColumn("ExitDate", lit("2024-01-01"))
      .withColumn("Duration", lit("-5"))
      .withColumn("AgeLastVisit", lit(50))
      .withColumn("AgeEnrollment", lit(200))
      .withColumn("PatientSource", lit("vct"))
    val regLkp = Seq(("reg-old", "TDF/3TC/DTG")).toDF("source_name", "target_name")
    val exitLkp = Seq(("exit-old", "Transfer Out")).toDF("source_name", "target_name")
    val psLkp = Seq(("nothing", "x")).toDF("source_name", "target_name")
    val out = Job.transform(source,
        ReferenceJobs.ctArtPatients(today, exitLkp, regLkp, psLkp))
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap

    // DOB floor is 1900 (1950 passes; 1899 sentinels); ART dates floor at 1980.
    assert(out(1L).getAs[java.sql.Date]("DOB").toString == "1950-06-01")
    assert(out(2L).getAs[java.sql.Date]("DOB").toString == "1900-01-01")
    assert(out(1L).getAs[java.sql.Date]("StartARTDate").toString == "1900-01-01")
    // Triple self-remap: each regimen column remaps INDEPENDENTLY, and a
    // miss keeps the column's own value (the reference's
    // PreviousARTRegimen/ExitReason slip is documented, not reproduced).
    assert(out(1L).getAs[String]("PreviousARTRegimen") == "TDF/3TC/DTG")
    assert(out(1L).getAs[String]("StartRegimen") == "TDF/3TC/DTG")
    assert(out(1L).getAs[String]("LastRegimen") == "keep-me")
    assert(out(2L).getAs[String]("PreviousARTRegimen") == "r2")
    assert(out(1L).getAs[String]("ExitReason") == "Transfer Out")
    // EMR/Project normalization; open vocab preserved.
    assert(out(1L).getAs[String]("Emr") == "OpenMRS")
    assert(out(2L).getAs[String]("Emr") == "Other EMR")
    assert(out(1L).getAs[String]("Project") == "Kenya HMIS II")
    assert(out(2L).getAs[String]("Project") == "Ampath Plus")
    // Age/duration clamps: [0,120] -> 999; negative duration -> 999.
    assert(out(1L).getAs[Double]("AgeARTStart") == 999d)
    assert(out(2L).getAs[Double]("AgeARTStart") == 42d)
    assert(out(1L).getAs[Double]("AgeEnrollment") == 999d)
    assert(out(1L).getAs[Double]("Duration") == 999d)
    assert(ReferenceJobs.referenceQuirks.contains("CT_ARTPatients"))
  }

  test("ctPatientVisits spec: clamps, vocab (incl. charset garbage), lookups") {
    val today = LocalDate.of(2026, 1, 1)
    val source = Seq(
      // (ID, SiteCode, PatientPK, VisitID, OIDate, VisitDate, NextAppointmentDate,
      //  Weight, Height, Pregnant, StabilityAssessment, DifferentiatedCare, FamilyPlanningMethod, PwP)
      (1L, 100L, 1L, 10L, "1999-12-31", "2024-01-01", "2026-06-01",
        "80", "170", "True", "Stable1",
        "Community ART distribution � Peer led", "fp-old", "pwp-old"),
      (2L, 100L, 2L, 11L, "2024-01-01", "1979-01-01", "2027-06-01",
        "250", "300", "UNKNOWN", "", "FADG", "none", "x"))
      .toDF("ID", "SiteCode", "PatientPK", "VisitID", "OIDate", "VisitDate",
        "NextAppointmentDate", "Weight", "Height", "Pregnant",
        "StabilityAssessment", "DifferentiatedCare", "FamilyPlanningMethod",
        "PwP")
    val fpLkp = Seq(("fp-old", "FP Canonical")).toDF("source_name", "target_name")
    val pwpLkp = Seq(("pwp-old", "PwP Canonical")).toDF("source_name", "target_name")
    val out = Job.transform(source,
        ReferenceJobs.ctPatientVisits(today, fpLkp, pwpLkp))
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap

    // OIDate floor is 2000-01-01 (tighter than the 1980 default).
    assert(out(1L).getAs[java.sql.Date]("OIDate").toString == "1900-01-01")
    // NextAppointmentDate may run 1 year into the future (E3)...
    assert(out(1L).getAs[java.sql.Date]("NextAppointmentDate").toString == "2026-06-01")
    // ...but not beyond it.
    assert(out(2L).getAs[java.sql.Date]("NextAppointmentDate").toString == "1900-01-01")
    assert(out(2L).getAs[java.sql.Date]("VisitDate").toString == "1900-01-01")
    // Varchar numeric clamps -> 999 sentinel.
    assert(out(2L).getAs[Double]("Weight") == 999d)
    assert(out(2L).getAs[Double]("Height") == 999d)
    assert(out(1L).getAs[Double]("Weight") == 80d)
    // Vocabulary, including the mis-decoded en-dash literal.
    assert(out(1L).getAs[String]("Pregnant") == "Yes")
    assert(out(1L).getAs[String]("DifferentiatedCare") ==
      "Community ART Distribution peer led")
    assert(out(2L).getAs[String]("DifferentiatedCare") ==
      "Facility ART distribution Group")
    assert(out(2L).getAs[String]("Pregnant") == null)
    assert(out(2L).getAs[String]("StabilityAssessment") == null)
    // Lookup remap overwrites on hit, keeps original on miss.
    assert(out(1L).getAs[String]("FamilyPlanningMethod") == "FP Canonical")
    assert(out(2L).getAs[String]("FamilyPlanningMethod") == "none")
    assert(out(1L).getAs[String]("PwP") == "PwP Canonical")
  }

  test("ctAdverseEvents spec: ARV cause triage verbatim") {
    val today = LocalDate.of(2026, 1, 1)
    val source = Seq(
      (1L, 100L, 1L, "2024-01-01", "efavirenze", "Mild|Mild|Mild",
        "CONTINUE REGIMEN", "Recovered/Resolved", "reg-old", "ae-old"),
      (2L, 100L, 2L, "2024-01-01", "inh, tdf,3tc,dtg, ctx", "Moderate|Mild",
        "SUBSTITUTED DRUG|STOP", "Requires intervention to prevent permanent damage",
        "r", "a"),
      (3L, 100L, 3L, "2024-01-01", "ipt side effect ", "", "", "", "r", "a"),
      (4L, 100L, 4L, "2024-01-01", "aspirin", "Severe", "STOP|STOP", "Ongoing",
        "r", "a"))
      .toDF("ID", "SiteCode", "PatientPK", "VisitDate", "AdverseEventCause",
        "Severity", "AdverseEventActionTaken", "AdverseEventClinicalOutcome",
        "AdverseEventRegimen", "AdverseEvent")
      .withColumn("AdverseEventStartDate", lit("2024-01-01"))
      .withColumn("AdverseEventEndDate", lit("2030-01-01"))
    val lkp = Seq(("reg-old", "TDF/3TC/DTG"), ("ae-old", "Rash"))
      .toDF("source_name", "target_name")
    val out = Job.transform(source,
        ReferenceJobs.ctAdverseEvents(today, lkp, lkp))
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap

    assert(out(1L).getAs[String]("AdverseEventCause") == "ARV")          // typo variant
    assert(out(2L).getAs[String]("AdverseEventCause") == "ARV + OTHER DRUGS")
    assert(out(3L).getAs[String]("AdverseEventCause") == "NON-ARVS")     // trailing space
    assert(out(4L).getAs[String]("AdverseEventCause") == "aspirin")      // open vocab: kept
    assert(out(1L).getAs[String]("Severity") == "Mild")
    assert(out(2L).getAs[String]("Severity") == "Unknown")
    assert(out(3L).getAs[String]("Severity") == null)
    assert(out(2L).getAs[String]("AdverseEventActionTaken") == "OTHER")
    assert(out(4L).getAs[String]("AdverseEventActionTaken") == "Drug Withdrawn")
    assert(out(2L).getAs[String]("AdverseEventClinicalOutcome") == "OTHER")
    assert(out(4L).getAs[String]("AdverseEventClinicalOutcome") == "Ongoing")
    // End date beyond today -> sentinel; regimen/event remapped.
    assert(out(1L).getAs[java.sql.Date]("AdverseEventEndDate").toString == "1900-01-01")
    assert(out(1L).getAs[String]("AdverseEventRegimen") == "TDF/3TC/DTG")
    assert(out(1L).getAs[String]("AdverseEvent") == "Rash")
  }

  test("htsClientTests spec: CLOSED vocabularies default instead of keeping") {
    val source = Seq(
      (1L, 100L, 1L, "E1", "C: Couple (includes polygamous)", "No TB signs",
        "1", "whatever", "Initial", "maybe", "Tent", "CITC", 12, "ep-old", "ts-old"),
      (2L, 100L, 2L, "E2", "garbage", "garbage", "garbage", "Yes", "garbage",
        "Yes", "garbage", "garbage", 2000, "none", "none"))
      .toDF("ID", "SiteCode", "PatientPK", "EncounterId", "ClientTestedAs",
        "TbScreening", "ClientSelfTested", "CoupleDiscordant", "TestType",
        "Consent", "Setting", "Approach", "MonthsSinceLastTest",
        "EntryPoint", "TestStrategy")
    val psLkp = Seq(("ep-old", "OPD")).toDF("source_name", "target_name")
    val tsLkp = Seq(("ts-old", "HP: Provider initiated"))
      .toDF("source_name", "target_name")
    val out = Job.transform(source,
        ReferenceJobs.htsClientTests(psLkp, tsLkp))
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap

    assert(out(1L).getAs[String]("ClientTestedAs") == "Couple")
    assert(out(1L).getAs[String]("TbScreening") == "No Signs")
    assert(out(1L).getAs[String]("ClientSelfTested") == "Yes")
    assert(out(1L).getAs[String]("TestType") == "Initial Test")
    assert(out(1L).getAs[String]("Setting") == "Facility")
    assert(out(1L).getAs[String]("Approach") == "Client Initiated Testing (CITC)")
    // CLOSED vocab: unrecognized values default (null / "Not Done"),
    // they do NOT pass through.
    assert(out(2L).getAs[String]("ClientTestedAs") == null)
    assert(out(2L).getAs[String]("TbScreening") == "Not Done")
    assert(out(2L).getAs[String]("ClientSelfTested") == null)
    assert(out(2L).getAs[String]("TestType") == null)
    // "whatever"/"maybe" are not Yes/No -> null even though non-empty.
    assert(out(1L).getAs[String]("CoupleDiscordant") == null)
    assert(out(1L).getAs[String]("Consent") == null)
    assert(out(2L).getAs[String]("CoupleDiscordant") == "Yes")
    assert(out(2L).getAs[String]("Consent") == "Yes")
    // MonthsSinceLastTest nulls above 1540, kept below.
    assert(out(1L).getAs[Integer]("MonthsSinceLastTest") == 12)
    assert(out(2L).getAs[Integer]("MonthsSinceLastTest") == null)
    // Lookups: hit remaps, miss keeps.
    assert(out(1L).getAs[String]("EntryPoint") == "OPD")
    assert(out(1L).getAs[String]("TestStrategy") == "HP: Provider initiated")
    assert(out(2L).getAs[String]("EntryPoint") == "none")
  }

  test("prepPatient spec: County repair, concept recodes, marital harmonization") {
    def row(id: Long, county: String, kp: String, ms: String, school: String) =
      (id, 100L, id, "2024-01-01", county, kp, ms, school, "x")
    val source = Seq(
      row(1L, "West Sakwa", "160579", "Never married", "1"),
      row(2L, "KIAMBU''", "105", "Living with partner", "2"),
      row(3L, "...", "whatever", "Separated", "3"),
      row(4L, "", "160578", "Married", ""),
      row(5L, "Nairobi", "165084", "Widowed", "1"))
      .toDF("ID", "SiteCode", "PatientPk", "Created", "County",
        "KeyPopulationType", "MaritalStatus", "Inschool", "Sex")
      .withColumn("DateStartedPrEP", lit("2024-01-01"))
      .withColumn("PrepNumber", $"PatientPk" + 700)
    val extra = Seq("DateLastUsedPrev", "PrevPrepReg",
      "ClientPreviouslyonPrep", "DateStartedPrEPattransferringfacility",
      "TransferFromFacility", "TransferInDate", "Refferedfrom",
      "PopulationType", "ReferralPoint", "ClientType", "Ward", "LandMark",
      "SubCounty", "CountyofBirth")
      .foldLeft(source)((d, c) => d.withColumn(c, lit("")))
    val out = Job.transform(extra, ReferenceJobs.prepPatient(LocalDate.of(2026, 1, 1)))
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap

    assert(out(1L).getAs[String]("County") == "Siaya")      // ward -> county
    assert(out(2L).getAs[String]("County") == "Kiambu")     // quote garbage
    assert(out(3L).getAs[String]("County") == "NOT DOCUMENTED")
    assert(out(4L).getAs[String]("County") == null)         // "" -> null
    assert(out(5L).getAs[String]("County") == "Nairobi")    // open vocab: kept
    assert(out(1L).getAs[String]("KeyPopulationType") == "FSW")
    assert(out(3L).getAs[String]("KeyPopulationType") == "whatever")
    assert(out(1L).getAs[String]("MaritalStatus") == "Single")
    assert(out(2L).getAs[String]("MaritalStatus") == "Cohabiting")
    assert(out(5L).getAs[String]("MaritalStatus") == "Widowed")
    assert(out(1L).getAs[String]("Inschool") == "Yes")
    assert(out(3L).getAs[String]("Inschool") == "3")        // unmapped kept
    // The fifteen empty-string columns null out.
    assert(out(1L).getAs[String]("Ward") == null)
    assert(out(4L).getAs[String]("Inschool") == "")         // NOT in the empty-null list
  }

  test("ctContactListing spec: concept-id leakage and typo repair") {
    val source = Seq(
      (1L, 100L, 1L, 150, "U", "Nice", "1065", "664"),
      (2L, 100L, 2L, 30, "F", "Daughter", "No", "1067"),
      (3L, 100L, 3L, 30, "X", "Friend", "Maybe", "huh"))
      .toDF("ID", "SiteCode", "PatientPK", "ContactAge", "ContactSex",
        "RelationshipWithPatient", "IPVScreeningOutcome", "KnowledgeOfHivStatus")
      .withColumn("PatientID", $"PatientPK" + 100)
    val out = Job.transform(source, ReferenceJobs.ctContactListing())
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    assert(out(1L).getAs[Double]("ContactAge") == 999d)
    assert(out(1L).getAs[String]("ContactSex") == "Undefined")
    assert(out(1L).getAs[String]("RelationshipWithPatient") == "Niece")
    assert(out(1L).getAs[String]("IPVScreeningOutcome") == "OTHER")
    assert(out(1L).getAs[String]("KnowledgeOfHivStatus") == "Yes")
    assert(out(2L).getAs[String]("RelationshipWithPatient") == "Child")
    assert(out(2L).getAs[String]("IPVScreeningOutcome") == "False")
    assert(out(2L).getAs[String]("KnowledgeOfHivStatus") == "No")
    // Open vocabularies: unmapped values pass through.
    assert(out(3L).getAs[String]("ContactSex") == "X")
    assert(out(3L).getAs[String]("RelationshipWithPatient") == "Friend")
    assert(out(3L).getAs[String]("KnowledgeOfHivStatus") == "huh")
  }

  test("htsEligibility spec: per-column null-out floors, 0/1 recodes") {
    val source = Seq(
      (1L, 100L, 1L, "1", "0", "HP:Hospital Patient", "1975-06-01", "2018-12-31"),
      (2L, 100L, 2L, "Yes", "", "walk-in", "1985-06-01", "2019-01-01"))
      .toDF("ID", "SiteCode", "PatientPk", "Cough", "Pregnant", "PatientType",
        "DateTestedProvider", "VisitDate")
      .withColumn("HtsNumber", $"PatientPk" + 300)
      .withColumn("PatientPK", $"PatientPk")
    val extra = Seq("WeightLoss", "NightSweats", "IsHealthWorker", "TypeGBV",
      "ReceivedServices", "ResultOfHIVSelf", "ReasonsForIneligibility",
      "ChildReasonsForIneligibility", "PartnerHIVStatus",
      "RelationshipWithContact")
      .foldLeft(source)((d, c) => d.withColumn(c, lit("")))
    val out = Job.transform(extra, ReferenceJobs.htsEligibility())
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    // Below-floor dates NULL (no sentinel), different floors per column.
    assert(out(1L).getAs[java.sql.Date]("DateTestedProvider") == null)
    assert(out(1L).getAs[java.sql.Date]("VisitDate") == null)
    assert(out(2L).getAs[java.sql.Date]("DateTestedProvider").toString == "1985-06-01")
    assert(out(2L).getAs[java.sql.Date]("VisitDate").toString == "2019-01-01")
    assert(out(1L).getAs[String]("Cough") == "Yes")
    assert(out(2L).getAs[String]("Cough") == "Yes") // already canonical: kept
    assert(out(1L).getAs[String]("Pregnant") == "No")
    assert(out(2L).getAs[String]("Pregnant") == "") // "" not in recode map, not empty-nulled
    assert(out(1L).getAs[String]("PatientType") == "Hospital Patient")
    assert(out(2L).getAs[String]("PatientType") == "walk-in")
    assert(out(1L).getAs[String]("TypeGBV") == null)
  }

  test("ctPatientPharmacy spec: one-sided clamps with pass-through, no PII") {
    val source = Seq(
      (1L, 100L, 1L, 10L, "-3", "0", "1850-01-01", "drug-old", "t", "p"),
      (2L, 100L, 2L, 11L, "30", "14", "2024-06-01", "other", "t", "p"))
      .toDF("ID", "SiteCode", "PatientPK", "VisitID", "Duration",
        "PeriodTaken", "ExpectedReturn", "Drug", "TreatmentType",
        "ProphylaxisType")
      .withColumn("Emr", lit("Ampath AMRS"))
      .withColumn("Project", lit("DREAM"))
    val lkp = Seq(("drug-old", "TDF/3TC/DTG")).toDF("source_name", "target_name")
    val spec = ReferenceJobs.ctPatientPharmacy(lkp, lkp, lkp)
    val out = Job.transform(source, spec)
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    assert(out(1L).getAs[Double]("Duration") == 999d)
    assert(out(2L).getAs[Double]("Duration") == 30d)   // pass-through (quirk NOT reproduced)
    assert(out(1L).getAs[Double]("PeriodTaken") == 999d) // 0 is out of range (leq)
    assert(out(2L).getAs[Double]("PeriodTaken") == 14d)
    assert(out(1L).getAs[java.sql.Date]("ExpectedReturn").toString == "1900-01-01")
    assert(out(2L).getAs[java.sql.Date]("ExpectedReturn").toString == "2024-06-01")
    assert(out(1L).getAs[String]("Drug") == "TDF/3TC/DTG")
    assert(spec.piiHash.isEmpty) // hashing commented out in the reference
    assert(ReferenceJobs.referenceQuirks.contains("CT_PatientPharmacy"))
  }

  test("prepBehaviourRisk spec: thirteen empty-to-null columns, no PII") {
    val spec = ReferenceJobs.prepBehaviourRisk()
    assert(spec.emptyToNull.size == 13 && spec.piiHash.isEmpty)
    val source = spec.emptyToNull
      .foldLeft(Seq((1L, 100L, 1L, 10L))
        .toDF("ID", "SiteCode", "PatientPk", "VisitID"))((d, c) =>
        d.withColumn(c, lit("")))
    val row = Job.transform(source, spec).collect().head
    spec.emptyToNull.foreach(c => assert(row.getAs[String](c) == null, c))
  }

  test("htsPartnerNotificationServices spec: N/A literal, range null-out") {
    val source = Seq(
      (1L, 100L, 1L, 5L, "D: Dual Referral", "Y", "0", "N/A", 120, ""),
      (2L, 100L, 2L, 6L, "walk-in", "maybe", "Yes", "Yes", 33, "ccc-1"))
      .toDF("ID", "SiteCode", "PatientPk", "PartnerPatientPk", "PnsApproach",
        "LinkedToCare", "PnsConsent", "ScreenedForIpv", "Age", "CccNumber")
      .withColumn("FacilityLinkedTo", lit(""))
      .withColumn("PatientPK", $"PatientPk")
      .withColumn("HtsNumber", $"PatientPk" + 40)
    val out = Job.transform(source,
        ReferenceJobs.htsPartnerNotificationServices())
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    assert(out(1L).getAs[String]("PnsApproach") == "Provider Referral")
    assert(out(2L).getAs[String]("PnsApproach") == "walk-in")
    assert(out(1L).getAs[String]("LinkedToCare") == "Yes")
    assert(out(2L).getAs[String]("LinkedToCare") == "maybe")
    assert(out(1L).getAs[String]("PnsConsent") == "No")
    assert(out(1L).getAs[String]("ScreenedForIpv") == null)   // N/A literal
    assert(out(2L).getAs[String]("ScreenedForIpv") == "Yes")
    assert(out(1L).getAs[Integer]("Age") == null)             // outside [0,100]
    assert(out(2L).getAs[Integer]("Age") == 33)
    assert(out(1L).getAs[String]("CccNumber") == null)
  }

  test("ctCovid and prepAdverseEvents specs run end-to-end") {
    val today = LocalDate.of(2026, 1, 1)
    val covid = Seq((1L, 100L, 1L, 10L, "2030-01-01", "Partial"))
      .toDF("ID", "SiteCode", "PatientPK", "VisitID", "Covid19AssessmentDate",
        "VaccinationStatus")
      .withColumn("DateGivenFirstDose", lit("2021-06-01"))
      .withColumn("DateGivenSecondDose", lit("2021-09-01"))
      .withColumn("PatientID", $"PatientPK")
    val c = Job.transform(covid, ReferenceJobs.ctCovid(today)).collect().head
    assert(c.getAs[java.sql.Date]("Covid19AssessmentDate").toString == "1900-01-01")
    assert(c.getAs[java.sql.Date]("DateGivenFirstDose").toString == "2021-06-01")
    assert(c.getAs[String]("VaccinationStatus") == "Partially Vaccinated")

    val spec = ReferenceJobs.prepAdverseEvents()
    assert(spec.emptyToNull.size == 8 && spec.piiHash.isEmpty)
    val ae = spec.emptyToNull
      .foldLeft(Seq((1L, 100L, 1L)).toDF("ID", "SiteCode", "PatientPk"))(
        (d, col_) => d.withColumn(col_, lit("")))
    val row = Job.transform(ae, spec).collect().head
    spec.emptyToNull.foreach(col_ => assert(row.getAs[String](col_) == null, col_))
  }

  test("ctPatientLabs / ctPatientStatus / ctPatientBaselines / ctAllergies specs") {
    val today = LocalDate.of(2026, 1, 1)
    val labs = Seq(
      (1L, 100L, 1L, 10L, "-1", "tn-old", "1899-01-01"),
      (2L, 100L, 2L, 11L, "350", "CD4", "2024-01-01"))
      .toDF("ID", "SiteCode", "PatientPK", "VisitID", "TestResult",
        "TestName", "ReportedbyDate")
      .withColumn("OrderedbyDate", lit("2024-01-01"))
      .withColumn("Emr", lit("Ampath AMRS"))
      .withColumn("PatientID", $"PatientPK")
    val tnLkp = Seq(("tn-old", "Viral Load Test")).toDF("source_name", "target_name")
    val l = Job.transform(labs, ReferenceJobs.ctPatientLabs(today, tnLkp))
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    assert(l(1L).getAs[String]("TestResult") == "Viral Load") // negative -> relabel
    assert(l(2L).getAs[String]("TestResult") == "350")
    assert(l(1L).getAs[java.sql.Date]("ReportedbyDate").toString == "1900-01-01")
    assert(l(1L).getAs[String]("TestName") == "Viral Load Test")
    assert(l(1L).getAs[String]("Emr") == "AMRS")

    val status = Seq(
      (1L, 100L, 1L, "2003-12-31", "DREAM Kenya Trusts"),
      (2L, 100L, 2L, "2010-06-01", "DREAM")) // NOT in this job's vocab
      .toDF("ID", "SiteCode", "PatientPK", "ExitDate", "Project")
      .withColumn("Emr", lit("x")).withColumn("PatientID", $"PatientPK")
    val s = Job.transform(status, ReferenceJobs.ctPatientStatus(today))
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    assert(s(1L).getAs[java.sql.Date]("ExitDate").toString == "1900-01-01") // 2004 floor
    assert(s(2L).getAs[java.sql.Date]("ExitDate").toString == "2010-06-01")
    assert(s(1L).getAs[String]("Project") == "Kenya HMIS II")
    assert(s(2L).getAs[String]("Project") == "DREAM") // per-job vocab drift preserved

    val base = Seq((1L, 100L, 1L, "-5", "1979-01-01", "2024-01-01"))
      .toDF("ID", "SiteCode", "PatientPK", "bCD4", "bWHODate", "bCD4Date")
      .withColumn("PatientID", $"PatientPK")
    val b = Job.transform(base, ReferenceJobs.ctPatientBaselines(today)).collect().head
    assert(b.getAs[Double]("bCD4") == 999d)
    assert(b.getAs[java.sql.Date]("bWHODate").toString == "1900-01-01")
    assert(b.getAs[java.sql.Date]("bCD4Date").toString == "2024-01-01")

    val allergies = Seq((1L, 100L, 1L, 10L, "Mild|Mild", "ci-old", "a", "b"))
      .toDF("ID", "SiteCode", "PatientPK", "VisitID", "AllergySeverity",
        "ChronicIllness", "AllergyCausativeAgent", "AllergicReaction")
      .withColumn("ChronicOnsetDate", lit("2024-01-01"))
      .withColumn("PatientID", $"PatientPK")
    val ciLkp = Seq(("ci-old", "Diabetes")).toDF("source_name", "target_name")
    val a = Job.transform(allergies,
      ReferenceJobs.ctAllergies(today, ciLkp, ciLkp, ciLkp)).collect().head
    assert(a.getAs[String]("AllergySeverity") == "Mild")
    assert(a.getAs[String]("ChronicIllness") == "Diabetes")
    assert(a.getAs[String]("AllergyCausativeAgent") == "a") // miss keeps
  }

  test("prepVisits spec: distinct + stacked dual GROUP-BY-MAX dedup") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val source = Seq(
      // Key (1, 100): row 12 has max Created, max DateExtracted AND max ID -> survives.
      (10L, 1L, 100L, d("2024-01-01"), d("2024-01-05"), "v1"),
      (12L, 1L, 100L, d("2024-02-01"), d("2024-02-05"), "v2"),
      // Key (2, 100): max Created on ID 21, max DateExtracted on ID 22 ->
      // no row matches both maxima (plus MaxID) -> key DROPS entirely.
      (21L, 2L, 100L, d("2024-03-01"), d("2024-01-05"), "v3"),
      (22L, 2L, 100L, d("2024-01-01"), d("2024-03-05"), "v4"),
      // Key (3, 100): exact duplicate rows -> DISTINCT collapses them first.
      (30L, 3L, 100L, d("2024-01-01"), d("2024-01-05"), "v5"),
      (30L, 3L, 100L, d("2024-01-01"), d("2024-01-05"), "v5"),
      // Key (4, 100): ID 41 holds max Created AND max ID, but ID 40
      // alone holds max DateExtracted. SIMULTANEOUS evaluation (the
      // reference's) drops the whole key; a sequential second pass
      // would wrongly resurrect ID 41 (its DateExtracted becomes the
      // max among survivors).
      (41L, 4L, 100L, d("2024-05-01"), d("2024-01-05"), "v6"),
      (40L, 4L, 100L, d("2024-01-01"), d("2024-05-05"), "v7"))
      .toDF("ID", "PatientPk", "SiteCode", "Created", "DateExtracted", "Visit")
      .withColumn("PrepNumber", $"PatientPk" + 500)
    val out = Job.transform(source, ReferenceJobs.prepVisits())
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    assert(out.keySet == Set(12L, 30L))
    assert(out(12L).getAs[String]("Visit") == "v2")
  }

  test("htsTestKits spec: dual-format expiry repair compute-before-write") {
    val source = Seq(
      (1L, 100L, 1L, "2021-05-13 00:00:00", "N/A", ""),
      (2L, 100L, 2L, "13/05/2021", "Positive", "Kit B"),
      (3L, 100L, 3L, "garbage", "Negative", "Kit C"))
      .toDF("ID", "SiteCode", "PatientPk", "TestKitExpiry1", "TestResult2",
        "TestKitName2")
      .withColumn("TestKitName1", lit(""))
      .withColumn("TestKitExpiry2", lit("13/05/2021"))
      .withColumn("PatientPK", $"PatientPk")
      .withColumn("HtsNumber", $"PatientPk" + 10)
    val out = Job.transform(source, ReferenceJobs.htsTestKits())
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    assert(out(1L).getAs[java.sql.Timestamp]("TestKitExpiry1").toString
      .startsWith("2021-05-13"))                       // ISO parse
    assert(out(2L).getAs[java.sql.Timestamp]("TestKitExpiry1").toString
      .startsWith("2021-05-13"))                       // dd/MM/yyyy fallback
    assert(out(3L).getAs[java.sql.Timestamp]("TestKitExpiry1") == null) // garbage
    assert(out(1L).getAs[String]("TestResult2") == null)   // N/A literal
    assert(out(2L).getAs[String]("TestResult2") == "Positive")
    assert(out(1L).getAs[String]("TestKitName2") == null)
  }

  test("small-family specs: IPT truncated literals, OTZ 2012 floor, misc") {
    val today = LocalDate.of(2026, 1, 1)
    val ipt = Seq((1L, 100L, 1L, 10L, "1", "No more drug Interru"),
        (2L, 100L, 2L, 11L, "maybe", "Routine"))
      .toDF("ID", "SiteCode", "PatientPK", "VisitID", "TBScreening",
        "IndicationForIPT")
      .withColumn("PatientID", $"PatientPK")
    val i = Job.transform(ipt, ReferenceJobs.ctIpt())
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    assert(i(1L).getAs[String]("TBScreening") == "Screened")
    assert(i(1L).getAs[String]("IndicationForIPT") == "OTHER") // truncated literal
    assert(i(2L).getAs[String]("TBScreening") == "maybe")
    assert(i(2L).getAs[String]("IndicationForIPT") == "Routine")

    val otz = Seq((1L, 100L, 1L, 10L, "2011-12-31", "1"))
      .toDF("ID", "SiteCode", "PatientPK", "VisitID", "OTZEnrollmentDate",
        "TransferInStatus")
      .withColumn("SupportGroupInvolvement", lit("0"))
      .withColumn("PatientID", $"PatientPK")
    val o = Job.transform(otz, ReferenceJobs.ctOtz(today)).collect().head
    assert(o.getAs[java.sql.Date]("OTZEnrollmentDate").toString == "1900-01-01")
    assert(o.getAs[String]("TransferInStatus") == "Yes")
    assert(o.getAs[String]("SupportGroupInvolvement") == "No")

    val ph = Seq((1L, 100L, 1L, 10L, 13, "1979-06-01", ""),
        (2L, 100L, 2L, 11L, 3, "2024-06-01", "TDF"))
      .toDF("ID", "SiteCode", "PatientPk", "VisitID", "Duration",
        "DispenseDate", "RegimenPrescribed")
      .withColumn("PrepNumber", $"PatientPk")
      .withColumn("PatientPK", $"PatientPk")
    val p = Job.transform(ph, ReferenceJobs.prepPharmacy())
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    assert(p(1L).getAs[Integer]("Duration") == null)       // > 12
    assert(p(2L).getAs[Integer]("Duration") == 3)
    assert(p(1L).getAs[java.sql.Date]("DispenseDate") == null) // < 1980
    assert(p(2L).getAs[java.sql.Date]("DispenseDate").toString == "2024-06-01")
    assert(p(1L).getAs[String]("RegimenPrescribed") == null)

    val tr = Seq((1L, 100L, 1L, "h1", "NULL"), (2L, 100L, 2L, "h2", "Contacted"))
      .toDF("ID", "SiteCode", "PatientPk", "HtsNumber", "TraceOutcome")
      .withColumn("PatientPK", $"PatientPk")
    val t = Job.transform(tr, ReferenceJobs.htsPartnerTracing())
      .collect().map(r => r.getAs[Long]("ID") -> r).toMap
    assert(t(1L).getAs[String]("TraceOutcome") == null)
    assert(t(2L).getAs[String]("TraceOutcome") == "Contacted")

    // Empty-to-null pairs + date-floor trio resolve and run.
    assert(ReferenceJobs.prepCareTermination().emptyToNull.size == 2)
    assert(ReferenceJobs.prepLab().emptyToNull.size == 2)
    assert(ReferenceJobs.htsClientLinkages().dateNullOutside.size == 3)
    assert(ReferenceJobs.ctDrugAlcoholScreening().recodes("Smoking")("Yes") == "OTHER")
    assert(ReferenceJobs.ctEnhancedAdherenceCounselling(today).dateClamps.size == 2)
  }

  test("genericSpec resolves every cataloged target; hash sets match the jobs") {
    ReferenceJobs.antiJoinKeys.keys.foreach { t =>
      val spec = ReferenceJobs.genericSpec(t)
      assert(spec.keys.nonEmpty, t)
    }
    // Every hash-set target is a cataloged target.
    assert(ReferenceJobs.piiHashColumns.keySet
      .subsetOf(ReferenceJobs.antiJoinKeys.keySet))
    // The transcribed deviations from family defaults.
    assert(ReferenceJobs.piiHashColumns("CT_Patient").contains("NUPI"))
    assert(ReferenceJobs.piiHashColumns("HTS_clients") == Seq("NUPI", "PatientPK"))
    assert(ReferenceJobs.piiHashColumns("HTS_ClientTests") == Seq("PatientPK"))
    assert(ReferenceJobs.piiHashColumns("MNCH_MotherBabyPairs").size == 4)
    assert(ReferenceJobs.piiHashColumns("MNCH_CwcEnrolments")
      .contains("MothersCCCNo"))
    // No-hash jobs stay empty; the strict-key nuance rides along.
    assert(ReferenceJobs.genericSpec("ALL_EMRSites").piiHash.isEmpty)
    assert(ReferenceJobs.genericSpec("MNCH_Immunization").strictKeys == Set("ID"))
    // The generic spec runs end-to-end (transform is identity + hash).
    val out = Job.run(
      Seq((1L, 100L, "h1")).toDF("PatientPK", "SiteCode", "HtsNumber"),
      Seq((2L, 100L, "h2")).toDF("PatientPK", "SiteCode", "HtsNumber"),
      ReferenceJobs.genericSpec("HTS_TestKits"))
    val row = out.collect().head
    assert(row.getAs[String]("HtsNumberHash") != null &&
      row.getAs[String]("PatientPKHash") != null)
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
