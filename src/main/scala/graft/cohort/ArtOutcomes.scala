package graft.cohort

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of-date cohort outcome engine — the Spark-native re-expression of
  * the reference's one genuinely algorithmic job, the 250-line T-SQL of
  * `Load Historical ART Outcome Base Table/src/main/resources/
  * LoadHistoricalARTOutcomes.sql`:
  *
  *  - recursive-CTE month spine (`:4-19`)       -> [[monthEndSpine]]
  *    (`sequence` + `explode` + `last_day`; Spark needs no recursion)
  *  - cursor loop over month-ends (`:22-31`)    -> set-based: facts are
  *    joined once against the whole broadcast spine and windowed per
  *    (patient, as_of) — one pass over the facts instead of one rescan
  *    per month, which is what makes this hold at 100 TB
  *  - `row_number` latest-record CTEs (`:81-157`) -> [[latestAsOf]]
  *  - full-outer visit+pharmacy combine (`:158-182`) -> [[outcomes]]
  *  - next-appointment fix-up, `datediff >= 365 -> last encounter + 30`
  *    (`:183-196`) -> [[outcomes]]
  *  - ordered outcome CASE (`:197-232`), where branch ORDER is semantic
  *    (discontinuation wins over exit letter — SURVEY §7.4 risk 5)
  *
  * Input frames use generic role columns:
  *   visits    (patient_id, visit_date, visit_id, next_appt)
  *   pharmacy  (patient_id, dispense_date, expected_return, disp_id, disp_sub)
  *   exits     (patient_id, exit_date, exit_reason, exit_id)
  *   disc      (patient_id, disc_date, disc_id)   — effective discontinuation
  *   patients  (patient_id)
  */
object ArtOutcomes {

  /** U2′ — month-end spine: one row per calendar month end in
    * [from, to] (both interpreted by their month). */
  def monthEndSpine(spark: SparkSession, from: LocalDate, to: LocalDate): DataFrame =
    spark.range(1).select(explode(sequence(
        lit(from.withDayOfMonth(1).toString).cast("date"),
        lit(to.withDayOfMonth(1).toString).cast("date"),
        expr("interval 1 month"))).as("m"))
      .select(last_day(col("m")).as("as_of"))

  /** W1-as-of — latest fact per (patient, as-of month).
    *
    * NOT implemented as a `date <= as_of` fan-out join (every fact
    * duplicated into every later month — O(|facts| x |months|) shuffle,
    * which at the reference's real 75-month spine would blow a 100 TB
    * fact table up 75x). Instead, two linear passes:
    *
    *   1. bucket each fact into the earliest spine month it is visible
    *      in (facts older than the spine fold into the first month,
    *      facts past the last month drop) and keep the latest fact per
    *      (patient, bucket) — one window over O(|facts|) rows;
    *   2. forward-fill each bucket's payload over the months it is the
    *      latest for — `lead` gives the next bucket, a month `sequence`
    *      explode emits one row per covered spine month. All payload
    *      columns are packed into ONE struct before filling so they
    *      always travel together from the same source fact (per-column
    *      `last(ignoreNulls)` would mix columns from different facts
    *      when a payload field is legitimately null).
    *
    * The explode formulation (vs. lattice LEFT JOIN facts + a
    * `last(ignoreNulls)` window, or skeleton-UNION + window) makes the
    * aggregated facts SINGLE-consumer: both alternatives need a second
    * pass to enumerate (patient x month), and because column pruning
    * specializes that branch's subtree, exchange reuse never kicks in —
    * the whole fact pipeline executes twice (measured). Here the fact
    * pipeline runs exactly once, and the generator output is exactly
    * the filled lattice (no oversized intermediate).
    *
    * Output: one row per (patient_id, as_of) that has a visible fact,
    * with the fact's payload columns. */
  def latestAsOf(facts: DataFrame, spine: DataFrame, dateCol: String,
      tiebreak: Seq[String]): DataFrame = {
    val payloadCols = facts.columns.filterNot(_ == "patient_id").toSeq
    val spineAgg = spine.agg(min(col("as_of")).as("lo"), max(col("as_of")).as("hi"))

    // 1. earliest visible spine month per fact; latest fact per bucket.
    //    `max_by` over the (date, tiebreak...) ordering struct instead
    //    of a row_number window: partial aggregation combines map-side,
    //    so the shuffle carries one row per (patient, bucket) per map
    //    partition rather than sorting every fact row. Equivalent to
    //    "order desc, keep first" whenever the tiebreak is a total
    //    order (it is: unique ids).
    val bucketed = facts
      .join(broadcast(spineAgg))
      .filter(col(dateCol) <= col("hi"))
      .withColumn("__bucket", greatest(last_day(col(dateCol)), col("lo")))
      .drop("lo", "hi")
    val orderStruct = struct((dateCol +: tiebreak).map(col): _*)
    val perBucket = bucketed
      .groupBy(col("patient_id"), col("__bucket"))
      .agg(max_by(struct(payloadCols.map(col): _*), orderStruct).as("__payload"))

    // 2. explode each bucket over [bucket, next bucket) — spine hi for
    //    the last. Buckets are month-ends; the sequence walks month
    //    STARTS (`trunc 'MM'`) because stepping a month-end by
    //    `interval 1 month` drifts (Jan 31 -> Feb 28 -> Mar 28).
    val wl = Window.partitionBy(col("patient_id")).orderBy(col("__bucket"))
    val bMon = trunc(col("__bucket"), "MM")
    val endMon = when(col("__next").isNull, trunc(col("hi"), "MM"))
      .otherwise(add_months(trunc(col("__next"), "MM"), -1))
    val filled = perBucket
      .join(broadcast(spineAgg.select(col("hi"))))
      .withColumn("__next", lead(col("__bucket"), 1).over(wl))
      .select(col("patient_id"),
        explode(transform(
          sequence(bMon, endMon, expr("interval 1 month")),
          m => last_day(m))).as("as_of"),
        col("__payload").as("__filled"))
    payloadCols.foldLeft(filled)((d, c) =>
        d.withColumn(c, col(s"__filled.$c")))
      .drop("__filled")
  }

  /** The full cohort: one row per (patient, as_of) with the ART-outcome
    * code. Fix-up anchor, CASE branch order and branch conditions
    * mirror the reference (`LoadHistoricalARTOutcomes.sql:183-232`);
    * see the deviations note at the end of this doc.
    *
    * Execution shape: the three AS-OF fact streams (visit / dispense /
    * exit) are UNIONED into one tall frame with a `kind` tag and a
    * common wide payload, so the whole as-of state machine runs as ONE
    * bucket-aggregate, ONE forward-fill window and ONE pivot-back —
    * instead of per-stream latestAsOf pipelines plus a full-outer join
    * (which is what the per-kind pivot subsumes: a patient-month with
    * only visits simply has a null dispense payload, the
    * vw_PatientLastEncounter full-outer semantics — reference
    * `:158-182`). The discontinuation stream is NOT as-of windowed:
    * the reference's `latest_effective_discontinuation` CTE (`:109-128`)
    * takes the latest record over ALL time (no `<= @as_of_date`
    * filter), so it reduces to one scalar row per patient, joined to
    * the universe once.
    *
    * Role mapping: `disc` carries (patient_id, disc_date, disc_reason,
    * disc_id) where disc_date plays EffectiveDiscontinuationDate and
    * disc_reason plays ExitReason, with rows pre-filtered to non-null
    * dates (the reference CTE's `ExitDate is not null and
    * EffectiveDiscontinuationDate is not null`, `:120`); `visits`'
    * min(visit_date) plays StartARTDate in the NP branch.
    *
    * Intentional deviations from the reference, kept because they make
    * the operator a strict superset (oracle + tests mirror them):
    *  - With the default `encounterUniverse = false`, output covers the
    *    FULL patient x month universe; the reference emits rows only
    *    for patients with >= 1 visit-or-dispense encounter as of the
    *    month (`:158-182` drives membership from last_encounter, whose
    *    `where ... is not null` keeps exactly the rows where at least
    *    one of the two encounter streams has a visible fact). A no-fact
    *    patient-month classifies as 'NV' here. Pass
    *    `encounterUniverse = true` for the reference-literal
    *    membership: rows exist only where last_encounter is non-null
    *    (exit-only patient-months drop too — exits are not
    *    encounters), `patients` is then unused, and the patient x
    *    month lattice join disappears from the plan entirely.
    *  - The reference orders discontinuations by
    *    EffectiveDiscontinuationDate alone (`:118` — ties are
    *    nondeterministic); disc_id breaks ties here so reruns agree. */
  def outcomes(patients: DataFrame, visits: DataFrame, pharmacy: DataFrame,
      exits: DataFrame, disc: DataFrame, spine: DataFrame,
      encounterUniverse: Boolean = false,
      spineBounds: Option[(LocalDate, LocalDate)] = None): DataFrame = {

    // The spine's (lo, hi) month-end bounds: with `spineBounds` (the
    // from/to dates the caller built the spine from — the production
    // case: a literal reporting window) they are DRIVER-SIDE literals,
    // which removes one aggregate job and two broadcast exchanges from
    // every cohort plan; without, the original broadcast aggregate
    // runs. The literal values are exactly what the aggregate computes
    // (min/max over last_day of each month in [from, to] = last_day of
    // from/to's months; asserted equal in ArtOutcomesSpec).
    val spineAgg = spine.agg(min(col("as_of")).as("lo"),
      max(col("as_of")).as("hi"))
    def attachBounds(df: DataFrame, cols: Seq[String]): DataFrame =
      spineBounds match {
        case Some((from, to)) =>
          val bound = Map(
            "lo" -> lit(from.withDayOfMonth(from.lengthOfMonth).toString)
              .cast("date"),
            "hi" -> lit(to.withDayOfMonth(to.lengthOfMonth).toString)
              .cast("date"))
          cols.foldLeft(df)((d, c) => d.withColumn(c, bound(c)))
        case None =>
          df.join(broadcast(spineAgg.select(cols.map(col): _*)))
      }

    // Common tall shape: (patient_id, kind, __fdate, __t1, __t2, payload...)
    val payloadFields = Seq("visit_date", "next_appt", "dispense_date",
      "expected_return", "exit_date", "exit_reason")
    def tall(df: DataFrame, kind: String, dateCol: String, t1: String,
        t2: Option[String], present: Map[String, String]): DataFrame = {
      val nullDate = lit(null).cast("date")
      val payload = payloadFields.map { f =>
        present.get(f).map(col).getOrElse(
          if (f == "exit_reason") lit(null).cast("string") else nullDate
        ).as(f)
      }
      df.select(Seq(col("patient_id"), lit(kind).as("kind"),
        col(dateCol).as("__fdate"), col(t1).as("__t1"),
        t2.map(col).getOrElse(lit(0L)).as("__t2")) ++ payload: _*)
    }
    val allFacts = tall(visits, "v", "visit_date", "visit_id", None,
        Map("visit_date" -> "visit_date", "next_appt" -> "next_appt"))
      .unionByName(tall(pharmacy, "d", "dispense_date", "disp_id", Some("disp_sub"),
        Map("dispense_date" -> "dispense_date",
          "expected_return" -> "expected_return")))
      .unionByName(tall(exits, "x", "exit_date", "exit_id", None,
        Map("exit_date" -> "exit_date", "exit_reason" -> "exit_reason")))

    // 1. latest fact per (patient, kind, visible-month bucket) —
    //    max_by partial aggregation, see latestAsOf.
    val bucketed = attachBounds(allFacts, Seq("lo", "hi"))
      .filter(col("__fdate") <= col("hi"))
      .withColumn("__bucket", greatest(last_day(col("__fdate")), col("lo")))
    val perBucket = bucketed
      .groupBy(col("patient_id"), col("kind"), col("__bucket"))
      .agg(max_by(struct(payloadFields.map(col): _*),
        struct(col("__fdate"), col("__t1"), col("__t2"))).as("__payload"))

    // 2. forward-fill via lead + month-sequence explode: a bucket's
    //    payload is the latest state for every month in [bucket, next
    //    bucket) — spine hi for the last bucket — so the filled
    //    (patient, kind) x month lattice is EMITTED directly by one
    //    window + one generator over the aggregated rows. This makes
    //    perBucket single-consumer, so the dominant fact pipeline
    //    (scans + broadcast joins + union + max_by) executes exactly
    //    once. Both two-consumer formulations (lattice LEFT JOIN facts
    //    + fill window; skeleton UNION + fill window) re-derived it:
    //    column pruning specializes the lattice branch's subtree, so
    //    exchange reuse never fires (measured: two full fact scans —
    //    double the dominant cost at 100 TB). The generator output is
    //    exactly the filled lattice, no oversized intermediate.
    //    Buckets are month-ends; the sequence walks month STARTS
    //    (`trunc 'MM'`) because stepping a month-end by `interval 1
    //    month` drifts (Jan 31 -> Feb 28 -> Mar 28).
    val wl = Window.partitionBy(col("patient_id"), col("kind"))
      .orderBy(col("__bucket"))
    val bMon = trunc(col("__bucket"), "MM")
    val endMon = when(col("__next").isNull, trunc(col("hi"), "MM"))
      .otherwise(add_months(trunc(col("__next"), "MM"), -1))
    val filled = attachBounds(perBucket, Seq("hi"))
      .withColumn("__next", lead(col("__bucket"), 1).over(wl))
      .select(col("patient_id").as("__l_pid"), col("kind").as("__l_kind"),
        explode(transform(
          sequence(bMon, endMon, expr("interval 1 month")),
          m => last_day(m))).as("as_of"),
        col("__payload").as("__filled"))

    // 3. pivot kinds back to columns: one row per (patient, as_of) with
    //    the latest visit/dispense/exit state (nulls where a kind has
    //    no visible fact — the full-outer combine, for free).
    def kindField(k: String, f: String) =
      max(when(col("__l_kind") === k, col(s"__filled.$f"))).as(f)
    val state = filled.groupBy(col("__l_pid").as("patient_id"), col("as_of"))
      .agg(kindField("v", "visit_date"),
        kindField("v", "next_appt"),
        kindField("d", "dispense_date"),
        kindField("d", "expected_return"),
        kindField("x", "exit_date"),
        kindField("x", "exit_reason"))
      .withColumn("last_encounter",
        greatest(col("visit_date"), col("dispense_date")))
      .withColumn("next_expected0",
        greatest(col("next_appt"), col("expected_return")))
      // Fix-up rule (reference :192): an appointment >= 365 days past
      // the AS-OF date is implausible and replaced by last_encounter +
      // 30 — `datediff(dd, @as_of_date, NextAppointmentDate) >= 365`,
      // anchored on the as-of date, not the last encounter.
      .withColumn("next_expected",
        when(datediff(col("next_expected0"), col("as_of")) >= 365,
          date_add(col("last_encounter"), 30))
        .otherwise(col("next_expected0")))

    // StartARTDate analog (NP branch) — earliest visit per patient.
    val firstVisit = visits.groupBy(col("patient_id").as("f_pid"))
      .agg(min(col("visit_date")).as("first_visit"))

    // Latest effective discontinuation per patient over ALL time
    // (reference :109-128; scalar per patient, not as-of windowed).
    val latestDisc = disc
      .groupBy(col("patient_id").as("c_pid"))
      .agg(max_by(struct(col("disc_date"), col("disc_reason")),
        struct(col("disc_date"), col("disc_id"))).as("__c"))
      .select(col("c_pid"), col("__c.disc_date").as("disc_date"),
        col("__c.disc_reason").as("disc_reason"))

    // Membership: reference-literal mode keeps exactly the
    // encounter-bearing (patient, month) rows — the state frame IS the
    // output skeleton, no patient dimension, no lattice join. Full-
    // universe mode enumerates patient x month (months broadcast —
    // tiny dimension) and left-joins the state.
    val base =
      if (encounterUniverse) state.filter(col("last_encounter").isNotNull)
      else patients.select(col("patient_id"))
        .join(broadcast(spine))
        .join(state.withColumnRenamed("patient_id", "s_pid")
            .withColumnRenamed("as_of", "s_asof"),
          col("patient_id") <=> col("s_pid") && col("as_of") <=> col("s_asof"),
          "left")
        .drop("s_pid", "s_asof")

    val full = base
      .join(firstVisit, col("patient_id") <=> col("f_pid"), "left")
      .join(broadcast(latestDisc), col("patient_id") <=> col("c_pid"), "left")

    // Ordered CASE — the order IS the semantics (reference :211-222):
    //   1. future-dated effective discontinuation (reason <> 'DIED',
    //      EffectiveDiscontinuationDate > eomonth(as_of))      -> 'V'
    //   2. ART start after the as-of month                     -> 'NP'
    //   3. exited                         -> first letter of reason
    //   4. appointment ahead or <= 30 days past                -> 'V'
    //   5. > 30 days past appointment                          -> 'uL'
    //   6. no appointment                                      -> 'NV'
    //   7. (fallback)                                          -> NULL
    // A null disc_reason falls through branch 1 (SQL `<> 'DIED'` is
    // unknown on NULL); a null first_visit falls through branch 2.
    val outcome =
      when(col("disc_date").isNotNull &&
          col("disc_reason") =!= "DIED" && col("disc_date") > col("as_of"),
          lit("V"))
        .when(col("first_visit") > col("as_of"), lit("NP"))
        .when(col("exit_date").isNotNull, substring(col("exit_reason"), 1, 1))
        .when(col("as_of") < col("next_expected") ||
          datediff(col("as_of"), col("next_expected")) <= 30, lit("V"))
        .when(datediff(col("as_of"), col("next_expected")) > 30, lit("uL"))
        .when(col("next_expected").isNull, lit("NV"))

    full.select(col("patient_id"), col("as_of"),
      col("last_encounter"), col("next_expected"), outcome.as("outcome"))
  }
}
