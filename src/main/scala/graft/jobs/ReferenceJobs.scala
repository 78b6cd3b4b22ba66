package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.DataFrame

/** The reference's job catalog as DATA.
  *
  * Every one of the 52 incremental jobs is the same pipeline
  * instantiated with a target table, an anti-join identity, and
  * cleaning/lookup rules — [[antiJoinKeys]] transcribes the complete
  * identity catalog from SURVEY.md Appendix A (each entry cites the
  * job's `LEFT ANTI JOIN` site), and the builders below give full
  * [[JobSpec]]s for the representative job families. A user of the
  * reference switches by pairing their source frame with the spec for
  * their target table and calling [[Job.load]].
  */
object ReferenceJobs {

  /** Target ODS table -> null-safe anti-join key (SURVEY Appendix A).
    * Event-level discriminators (VisitID / ExitDate / EncounterId /
    * TestName+TestResult / ...) appear exactly as the reference joins
    * them. */
  val antiJoinKeys: Map[String, Seq[String]] = Map(
    // CT family (source: DWAPICentral)
    "CT_Patient" -> Seq("SiteCode", "PatientPK"),
    "CT_ARTPatients" -> Seq("PatientPK", "SiteCode"),
    "CT_PatientVisits" -> Seq("PatientPK", "SiteCode", "VisitID"),
    "CT_PatientPharmacy" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_PatientLabs" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_PatientStatus" -> Seq("SiteCode", "PatientPK", "ExitDate"),
    "CT_PatientBaselines" -> Seq("SiteCode", "PatientPK"),
    "CT_AdverseEvents" -> Seq("SiteCode", "PatientPK", "VisitDate"),
    "CT_AllergiesChronicIllness" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_ContactListing" -> Seq("SiteCode", "PatientPK"),
    "CT_Covid" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_DefaulterTracing" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_DepressionScreening" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_DrugAlcoholScreening" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_EnhancedAdherenceCounselling" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_GbvScreening" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_Ipt" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_Otz" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_Ovc" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_CancerScreening" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_CervicalCancerScreening" -> Seq("SiteCode", "PatientPK", "VisitID"),
    "CT_FacilityManifest" -> Seq("ID"),
    "CT_IITRiskScores" -> Seq("ID"),
    "ALL_EMRSites" -> Seq("MFL_Code"),
    // HTS family (source: HTSCentral)
    "HTS_clients" -> Seq("PatientPK", "SiteCode"),
    "HTS_ClientTests" -> Seq("PatientPK", "SiteCode", "EncounterId"),
    "HTS_ClientLinkages" -> Seq("PatientPK", "SiteCode"),
    "HTS_ClientTracing" -> Seq("PatientPK", "SiteCode", "HtsNumber", "TracingOutcome"),
    "HTS_EligibilityExtract" -> Seq("PatientPk", "SiteCode"),
    "HTS_PartnerNotificationServices" -> Seq("PatientPk", "SiteCode", "PartnerPatientPk"),
    "HTS_PartnerTracings" -> Seq("PatientPk", "SiteCode", "HtsNumber"),
    "HTS_TestKits" -> Seq("PatientPk", "SiteCode"),
    // PrEP family (source: PREPCentral)
    "PrEP_Patient" -> Seq("PatientPk", "SiteCode"),
    "PrEP_Visits" -> Seq("PatientPk", "SiteCode", "VisitID"),
    "PrEP_Pharmacy" -> Seq("PatientPk", "SiteCode", "VisitID"),
    "PrEP_Lab" -> Seq("PatientPk", "SiteCode", "PrepNumber"),
    "PrEP_BehaviourRisk" -> Seq("PatientPk", "SiteCode", "VisitID"),
    "PrEP_CareTermination" -> Seq("PatientPk", "SiteCode"),
    "PrEP_AdverseEvent" -> Seq("PatientPk", "SiteCode"),
    // MNCH family (source: MNCHCentral)
    "MNCH_Patient" -> Seq("PatientPk", "SiteCode"),
    "MNCH_Enrolments" -> Seq("PatientPk", "SiteCode"),
    "MNCH_AncVisits" -> Seq("PatientPk", "SiteCode", "VisitID", "ANCClinicNumber"),
    "MNCH_MatVisits" -> Seq("PatientPk", "SiteCode"),
    "MNCH_PncVisits" -> Seq("PatientPk", "SiteCode"),
    "MNCH_CwcEnrolments" -> Seq("PatientPk", "SiteCode"),
    "MNCH_CwcVisits" -> Seq("PatientPk", "SiteCode"),
    "MNCH_Labs" -> Seq("PatientPk", "SiteCode", "VisitID", "TestName", "TestResult"),
    "MNCH_Arts" -> Seq("PatientPk", "SiteCode"),
    "MNCH_HEIs" -> Seq("PatientPk", "SiteCode"),
    "MNCH_Immunization" -> Seq("SiteCode", "PatientPK", "PatientMnchID", "ID"),
    "MNCH_MotherBabyPairs" -> Seq("PatientPk", "SiteCode"))

  /** Key components the reference compares with plain `=` instead of
    * `<=>`. Exactly one job mixes the two: `LoadMNCHImmunization.java:
    * 67-68` writes `s.ID = t.ID` amid three `<=>` components, so a
    * null-ID immunization row is re-inserted on every run there. Kept
    * as data so literal replay reproduces the reference bit-for-bit
    * (see [[graft.etl.Incremental.newRecords]] `strictKeys`). */
  val strictKeyComponents: Map[String, Set[String]] = Map(
    "MNCH_Immunization" -> Set("ID"))

  /** PII hash columns per family (SURVEY Appendix A footnote). */
  val piiColumns: Map[String, Seq[String]] = Map(
    "CT" -> Seq("PatientID", "PatientPK"),
    "HTS" -> Seq("PatientPK", "HtsNumber"),
    "PrEP" -> Seq("PatientPK", "PrepNumber"),
    "MNCH" -> Seq("PatientPK", "PatientMnchID"))

  private val DateLo = LocalDate.of(1980, 1, 1)
  private val Sentinel19th = LocalDate.of(1900, 1, 1)

  /** CT Patients shape (`Load CT Patients Job/.../LoadCTPatients.java`):
    * ten date clamps, gender/marital recodes, 4 lookup remaps, dedup by
    * latest (Created, ID). `today` injected; lookups supplied by the
    * caller (2-col source_name/target_name frames). */
  def ctPatients(today: LocalDate, maritalLkp: DataFrame,
      educationLkp: DataFrame): JobSpec = JobSpec(
    keys = antiJoinKeys("CT_Patient"),
    dedup = Some(Seq("SiteCode", "PatientPK") -> Seq("Created", "ID")),
    dateClamps = Seq("DOB", "RegistrationAtCCC", "RegistrationATPMTCT",
      "LastVisit", "StartARTDate", "PreviousARTStartDate")
      .map(_ -> (DateLo, today)).toMap,
    recodes = Map("Gender" -> Map("M" -> "Male", "F" -> "Female")),
    lookups = Seq("MaritalStatus" -> maritalLkp, "EducationLevel" -> educationLkp),
    piiHash = piiColumns("CT"))

  /** HTS Clients shape (`Load HTS Clients/.../LoadHtsClients.java`):
    * DOB nulled outside range rather than sentineled, 0/1 -> No/Yes
    * recodes, marital remap. */
  def htsClients(today: LocalDate, maritalLkp: DataFrame): JobSpec = JobSpec(
    keys = antiJoinKeys("HTS_clients"),
    dedup = Some(Seq("SiteCode", "PatientPK") -> Seq("DateExtracted", "ID")),
    dateClamps = Map("Dob" -> (DateLo, today)),
    recodes = Map(
      "EverTestedForHiv" -> Map("0" -> "No", "1" -> "Yes"),
      "Gender" -> Map("M" -> "Male", "F" -> "Female")),
    lookups = Seq("MaritalStatus" -> maritalLkp),
    piiHash = piiColumns("HTS"))

  /** PrEP Patient shape (`Load Prep Patient/.../LoadPrepPatient.java`):
    * fifteen empty-string-to-null columns dominate. */
  def prepPatient(today: LocalDate): JobSpec = JobSpec(
    keys = antiJoinKeys("PrEP_Patient"),
    dedup = Some(Seq("SiteCode", "PatientPk") -> Seq("Created", "ID")),
    dateClamps = Map("DateStartedPrEP" -> (DateLo, today)),
    emptyToNull = Seq("ClientType", "Refferedfrom", "TransferIn",
      "TransferInDate", "County", "SubCounty", "Location"),
    piiHash = Seq("PatientPk", "PrepNumber"))

  /** Facilities full-refresh shape (`Load CT Facilities Spark/...`):
    * no cleaning, no PII, single natural key — rebuilt wholesale via
    * [[graft.etl.Sink.fullRefresh]] rather than appended. */
  def facilities(): JobSpec = JobSpec(keys = antiJoinKeys("ALL_EMRSites"))
}
