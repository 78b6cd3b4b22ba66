package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.etl.{Cleaning, Dedup, Incremental, LookupRemap, PiiHash, SchemaDrift, Sink}

/** Config-driven incremental-load jobs.
  *
  * The reference's 54 modules are one pipeline shape instantiated with
  * different keys, cleaning rules, lookups and projections (SURVEY
  * §3.1; Appendix A catalogs every per-job key). Here a job is DATA —
  * a [[JobSpec]] — and [[Job.run]] is the single implementation of the
  * shape: latest-record dedup -> expression cleaning -> lookup remap ->
  * null-safe anti-join against the target -> PII hash -> projection ->
  * append. Adding a "job" means writing a spec, not copying a main.
  */
final case class JobSpec(
    /** Anti-join identity (Appendix A "anti-join key"). */
    keys: Seq[String],
    /** Latest-record dedup: (partition keys, descending order columns);
      * None when the source is already one row per key. */
    dedup: Option[(Seq[String], Seq[String])] = None,
    /** Row-level DISTINCT before anything else (the reference's
      * `SELECT DISTINCT` extract queries, e.g. `LoadPrepVisits.sql:1`). */
    distinctFirst: Boolean = false,
    /** Reference-literal stacked GROUP-BY-MAX dedups: a row must match
      * EVERY group's per-key maxima, all computed over the SAME input
      * frame (PrEP Visits stacks TWO — (Created,ID) and
      * (DateExtracted,ID) — `LoadPrepVisits.sql:66-75`; see
      * [[graft.etl.Dedup.maxFieldsDedupMulti]] for why sequential
      * application would diverge). */
    maxDedups: Seq[(Seq[String], Seq[String])] = Seq.empty,
    /** E1 — per-column date clamp bounds (today injected). */
    dateClamps: Map[String, (LocalDate, LocalDate)] = Map.empty,
    /** E2 — per-column date bounds outside which the value NULLS (no
      * sentinel); one-sided checks use a far bound (HTS Eligibility
      * nulls only below a floor — `LoadHtsEligibility.java:96-102`). */
    dateNullOutside: Map[String, (LocalDate, LocalDate)] = Map.empty,
    /** E4 — per-column numeric clamp bounds (sentinel 999). */
    numClamps: Map[String, (Double, Double)] = Map.empty,
    /** E4′ — per-column high bound above which the value nulls out. */
    numNullAbove: Map[String, Double] = Map.empty,
    /** E4″ — per-column numeric range outside which the value NULLS. */
    numNullOutside: Map[String, (Double, Double)] = Map.empty,
    /** E15 — per-column literal sentinel value that means NULL
      * ("N/A", "0001-01-01", ...). */
    valueToNull: Map[String, String] = Map.empty,
    /** E6 — columns where "" means NULL. */
    emptyToNull: Seq[String] = Seq.empty,
    /** E7/E8 — exact recode maps per column. */
    recodes: Map[String, Map[String, String]] = Map.empty,
    /** E5 — ordered CASE-IN canonicalization per column. */
    canonicalize: Map[String, Seq[(Seq[String], String)]] = Map.empty,
    /** J1/J2 — lookup remaps: column -> lookup frame (broadcast). */
    lookups: Seq[(String, DataFrame)] = Seq.empty,
    /** E9 — columns to hash into `<col>Hash`. */
    piiHash: Seq[String] = Seq.empty,
    /** Escape hatch for one-off column repairs no combinator covers
      * (CT Patient Labs relabels NEGATIVE numeric TestResults as the
      * string "Viral Load" — `LoadPatientLabs.java:96-97`). Applied
      * after the standard cleaning chain, before lookups. */
    customCols: Map[String, Column] = Map.empty,
    /** P1 — explicit output column list (schema alignment). */
    projection: Seq[String] = Seq.empty,
    /** Key components anti-joined with plain `=` instead of `<=>`
      * (reference-literal nuance — see
      * [[ReferenceJobs.strictKeyComponents]]). */
    strictKeys: Set[String] = Set.empty)

object Job {

  /** Cleaning + remap portion (no target needed) — useful on its own. */
  def transform(source: DataFrame, spec: JobSpec): DataFrame = {
    val distincted = if (spec.distinctFirst) source.distinct() else source
    // All maxDedup groups evaluate over the SAME frame (the reference
    // stacks its GROUP-BY-MAX self-joins against the original table).
    val maxDeduped =
      if (spec.maxDedups.isEmpty) distincted
      else Dedup.maxFieldsDedupMulti(distincted, spec.maxDedups)
    val deduped = spec.dedup.fold(maxDeduped) { case (k, o) =>
      Dedup.latestPerKey(maxDeduped, k, o)
    }
    val dated0 = spec.dateClamps.foldLeft(deduped) { case (d, (c, (lo, hi))) =>
      d.withColumn(c, Cleaning.clampDate(lo, hi)(col(c).cast("date")))
    }
    val dated = spec.dateNullOutside.foldLeft(dated0) { case (d, (c, (lo, hi))) =>
      d.withColumn(c, Cleaning.nullOutsideDate(lo, hi)(col(c).cast("date")))
    }
    val nummed0 = spec.numClamps.foldLeft(dated) { case (d, (c, (lo, hi))) =>
      d.withColumn(c, Cleaning.clampNum(lo, hi)(col(c)))
    }
    val nummed1 = spec.numNullAbove.foldLeft(nummed0) { case (d, (c, hi)) =>
      d.withColumn(c, Cleaning.nullAboveNum(hi)(col(c)))
    }
    val nummed2 = spec.numNullOutside.foldLeft(nummed1) { case (d, (c, (lo, hi))) =>
      d.withColumn(c, Cleaning.nullOutsideNum(lo, hi)(col(c)))
    }
    val nummed = spec.valueToNull.foldLeft(nummed2) { case (d, (c, v)) =>
      d.withColumn(c, Cleaning.sentinelToNull(v)(col(c)))
    }
    val blanked = spec.emptyToNull.foldLeft(nummed)((d, c) =>
      d.withColumn(c, Cleaning.emptyToNull(col(c))))
    val recoded = spec.recodes.foldLeft(blanked) { case (d, (c, m)) =>
      d.withColumn(c, Cleaning.recode(m)(col(c)))
    }
    val canoned = spec.canonicalize.foldLeft(recoded) { case (d, (c, m)) =>
      d.withColumn(c, Cleaning.canonicalize(m)(col(c)))
    }
    val customed = spec.customCols.foldLeft(canoned) { case (d, (c, expr)) =>
      d.withColumn(c, expr)
    }
    spec.lookups.foldLeft(customed) { case (d, (c, lkp)) =>
      LookupRemap.remap(d, lkp, c)
    }
  }

  /** Full incremental cycle against a target frame: returns the new,
    * cleaned, hashed, projected records (the frame the reference would
    * append — §3.1 steps 3-10). */
  def run(source: DataFrame, target: DataFrame, spec: JobSpec): DataFrame = {
    val cleaned = transform(source, spec)
    val fresh = Incremental.newRecords(cleaned, target, spec.keys,
      strictKeys = spec.strictKeys)
    val hashed = PiiHash.hashColumns(fresh, spec.piiHash)
    if (spec.projection.nonEmpty) hashed.select(spec.projection.map(col): _*)
    else hashed
  }

  /** run + append to a parquet target path; returns appended count
    * (§3.1 steps 3-11, with the count the reference logs). The fresh
    * frame is pinned DISK_ONLY across the count + append actions (via
    * [[Sink.runCountedAppend]]) so the clean+remap+anti-join plan runs
    * once, mirroring the reference's `persist(DISK_ONLY)` policy
    * (`LoadCTPatients.java:59,170`).
    *
    * Drift tolerance: when the target exists, the appended batch is
    * [[SchemaDrift.conform]]ed to the target's schema — a source that
    * grew, lost, or retyped columns since the last run (the drift the
    * reference's JDBC schema-on-read absorbs silently, SURVEY §1.1)
    * appends as typed NULLs / dropped extras / try_cast values instead
    * of forking the parquet table into mixed schemas. The drift, if
    * any, is returned by [[loadWithReport]]'s report frame. */
  def load(spark: SparkSession, source: DataFrame, targetPath: String,
      spec: JobSpec, writePartitions: Int = 0): Long =
    loadWithReport(spark, source, targetPath, spec, writePartitions)._1

  /** [[load]], also returning the schema-drift report for the appended
    * batch vs the pre-existing target (empty frame when the target is
    * being created or nothing drifted).
    *
    * Limit, by design: a batch that lost one of `spec.keys` fails at
    * analysis time in the anti-join — record identity cannot be
    * defaulted to NULL without silently re-keying the table; that
    * drift needs a human, not a conform(). */
  def loadWithReport(spark: SparkSession, source: DataFrame,
      targetPath: String, spec: JobSpec,
      writePartitions: Int = 0): (Long, DataFrame) = {
    val exists = Sink.pathExists(spark, targetPath)
    val (fresh, report) =
      if (!exists) {
        val cleaned = transform(source, spec)
        val hashed = PiiHash.hashColumns(cleaned, spec.piiHash)
        val projected =
          if (spec.projection.nonEmpty) hashed.select(spec.projection.map(col): _*)
          else hashed
        (projected, SchemaDrift.reportDf(spark, projected.schema, projected.schema))
      } else {
        val target = spark.read.parquet(targetPath)
        val out = run(source, target, spec)
        (SchemaDrift.conform(out, target.schema),
          SchemaDrift.reportDf(spark, target.schema, out.schema))
      }
    (Sink.runCountedAppend(fresh, targetPath, writePartitions), report)
  }
}
