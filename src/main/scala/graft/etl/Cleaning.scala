package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level cleaning combinators — the reference's largest
  * operator family (~277 `withColumn`/`when` sites across 54 jobs, all
  * built from `when(...).otherwise(...)` chains). Each combinator is a
  * pure `Column => Column` so it stays inside WholeStageCodegen and
  * composes into a single `Project` node — no UDFs anywhere.
  *
  * Reference semantics by operator id (SURVEY.md §2.3):
  *  - E1 date range clamp -> sentinel:  `Load CT Patients Job/.../LoadCTPatients.java:112-141`
  *  - E2 date range null-out:           `Load HTS Clients/.../LoadHtsClients.java:83-85`
  *  - E3 future-bounded date:           `Load CT Patient Visits/.../LoadPatientVisits.java:103-105`
  *  - E4 numeric clamp -> 999:          `Load CT ART Patients/.../LoadARTPatients.java:127-137`
  *  - E5 value-set canonicalization:    `Load CT Adverse Events/.../LoadAdverseEvents.java:100-104`
  *  - E6 empty-string -> null:          `Load Prep Patient/.../LoadPrepPatient.java:56-85`
  *  - E7/E8 recode maps:                `Load HTS Eligibility/.../LoadHtsEligibility.java:62-76`,
  *                                      `LoadARTPatients.java:121-126`
  *  - E12 coalesce fill:                `Load HTS Client Tests/src/main/resources/LoadHtsClientTests.sql:9`
  *  - E15 sentinel-date null-out:       `Load HTS Client Linkages/src/main/resources/LoadHtsClientLinkages.sql:16`
  *  - E16 dual-format date parse:       `Load HTS Test Kits/src/main/resources/CleanTestKits.sql:1-50`
  *
  * "Today" is always an injected parameter (never `LocalDate.now()`
  * inside the expression) so cleaning is deterministic and testable —
  * SURVEY §7.4 risk 4.
  */
object Cleaning {

  /** E1 — dates outside [lo, hi] replaced by a sentinel date
    * (reference uses 1900-01-01). Null passes through (no branch hits). */
  def clampDate(lo: LocalDate, hi: LocalDate,
      sentinel: LocalDate = LocalDate.of(1900, 1, 1))(c: Column): Column =
    when(c.lt(lit(lo.toString).cast("date")) ||
         c.gt(lit(hi.toString).cast("date")),
      lit(sentinel.toString).cast("date")).otherwise(c)

  /** E2 — dates outside [lo, hi] become NULL instead of a sentinel. */
  def nullOutsideDate(lo: LocalDate, hi: LocalDate)(c: Column): Column =
    when(c.lt(lit(lo.toString).cast("date")) ||
         c.gt(lit(hi.toString).cast("date")), lit(null)).otherwise(c)

  /** E3 — future-bounded date: allowed up to today+graceYears (the
    * reference lets NextAppointmentDate run 1 year ahead). */
  def futureBounded(lo: LocalDate, today: LocalDate, graceYears: Int = 1)(
      c: Column): Column =
    clampDate(lo, today.plusYears(graceYears.toLong))(c)

  /** E4 — numeric range clamp: value outside [lo, hi] -> sentinel
    * (reference uses 999). Works on varchar-typed numerics via a float
    * cast, exactly like the reference (`cast(DataTypes.FloatType)`);
    * non-numeric strings cast to NULL and pass through unclamped.
    * `try_cast`, not `cast`: Spark 4 defaults `spark.sql.ansi.enabled`
    * to true, where a plain cast THROWS on garbage — the combinator's
    * whole contract is garbage -> null repair, in either mode. (Under
    * ansi=false the two casts agree for string -> double.) */
  def clampNum(lo: Double, hi: Double, sentinel: Double = 999d)(
      c: Column): Column = {
    val f = c.try_cast("double")
    when(f.lt(lit(lo)) || f.gt(lit(hi)), lit(sentinel)).otherwise(f)
  }

  private def strLit(s: String): Column =
    if (s == null) lit(null).cast("string") else lit(s)

  /** E5 — value-set canonicalization: ordered (valueSet -> canonical)
    * CASE-IN chain; first match wins. A no-match keeps the original —
    * unless the mapping carries an EMPTY-value-set entry, which acts
    * as the `otherwise(...)` default (the closed-vocabulary form:
    * HTS Client Tests maps every recognized variant and nulls — or
    * "Not Done"s — everything else, `Load HTS Client Tests/...
    * /LoadHtsClientTests.java:81-109`). A null canonical value is a
    * real NULL target (the reference's `"" -> null` branches). */
  def canonicalize(mapping: Seq[(Seq[String], String)])(c: Column): Column = {
    val (defaults, cases) = mapping.partition(_._1.isEmpty)
    val base = defaults.lastOption.map(d => strLit(d._2)).getOrElse(c)
    cases.foldRight(base) { case ((values, canon), acc) =>
      when(c.isin(values.map(lit): _*), strLit(canon)).otherwise(acc)
    }
  }

  /** E4′ — numeric high-bound null-out: values above `hi` become NULL
    * (no sentinel). The reference nulls MonthsSinceLastTest > 1540
    * (`LoadHtsClientTests.java:111-112`). */
  def nullAboveNum(hi: Double)(c: Column): Column =
    when(c.gt(lit(hi)), lit(null)).otherwise(c)

  /** E4″ — numeric range null-out: values outside [lo, hi] become
    * NULL (Partner Notification Services nulls Age outside [0, 100] —
    * `LoadPartnerNotificationServices.java:76-77`). */
  def nullOutsideNum(lo: Double, hi: Double)(c: Column): Column =
    when(c.lt(lit(lo)) || c.gt(lit(hi)), lit(null)).otherwise(c)

  /** E7/E8 — exact-value recode map (binary recodes, EMR/project
    * normalization). Unmatched values keep the original. */
  def recode(mapping: Map[String, String])(c: Column): Column =
    canonicalize(mapping.toSeq.map { case (k, v) => (Seq(k), v) })(c)

  /** E6 — empty string -> NULL. */
  def emptyToNull(c: Column): Column =
    when(c === lit(""), lit(null)).otherwise(c)

  /** E15 — sentinel value -> NULL (reference: date '0001-01-01'). */
  def sentinelToNull(sentinel: String)(c: Column): Column =
    when(c === lit(sentinel), lit(null)).otherwise(c)

  /** E12 — null-coalesce fill. */
  def fillNull(default: Any)(c: Column): Column = coalesce(c, lit(default))

  /** E16 — dual-format date repair: try the primary (ISO) parse, fall
    * back to an alternate format (reference: `convert(datetime, x, 103)`
    * = dd/MM/yyyy), else NULL. `try_to_timestamp`, not `to_timestamp`:
    * failed parses must yield NULL (the pre-ANSI reference semantics)
    * in ANSI sessions too — Spark 4's default — where the plain
    * function throws instead of falling through to the next format. */
  def parseDualFormat(fallbackFmt: String = "dd/MM/yyyy HH:mm:ss")(
      c: Column): Column =
    coalesce(try_to_timestamp(c), try_to_timestamp(c, lit(fallbackFmt)))

  /** E10 — regex-guarded date repair (the reference's dormant `rlike`
    * variant, `Load HTS Test Kits/.../LoadHtsTestKits.java:54-70`):
    * each (pattern -> format) is tried in order; a value parses with a
    * format only if it first matches that format's regex; else NULL.
    * `try_to_timestamp` so a regex-passing but unparseable value
    * (e.g. month 13) repairs to NULL instead of throwing under ANSI. */
  def regexDateRepair(rules: Seq[(String, String)])(c: Column): Column =
    rules.foldRight(lit(null).cast("timestamp")) { case ((pattern, fmt), acc) =>
      when(c.rlike(pattern), try_to_timestamp(c, lit(fmt))).otherwise(acc)
    }
}
