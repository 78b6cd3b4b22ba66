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
    *   2. build the (patient x spine-month) lattice and forward-fill
    *      each month from the last non-empty bucket — one window over
    *      O(|patients| x |months|) rows. All payload columns are packed
    *      into ONE struct before filling so they always travel together
    *      from the same source fact (per-column `last(ignoreNulls)`
    *      would mix columns from different facts when a payload field
    *      is legitimately null).
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

    // 2. lattice x forward-fill (struct travels as a unit).
    val lattice = perBucket.select("patient_id").distinct()
      .crossJoin(broadcast(spine))
    val wf = Window.partitionBy(col("patient_id")).orderBy(col("as_of"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lattice
      .join(perBucket,
        lattice("patient_id") === perBucket("patient_id") &&
          col("as_of") === col("__bucket"), "left")
      .select(lattice("patient_id"), col("as_of"), col("__payload"))
      .withColumn("__filled", last(col("__payload"), ignoreNulls = true).over(wf))
      .filter(col("__filled").isNotNull)
    payloadCols.foldLeft(filled)((d, c) =>
        d.withColumn(c, col(s"__filled.$c")))
      .drop("__payload", "__filled")
  }

  /** The full cohort: one row per (patient, as_of) with the ART-outcome
    * code. Branch order mirrors the reference exactly. */
  def outcomes(patients: DataFrame, visits: DataFrame, pharmacy: DataFrame,
      exits: DataFrame, disc: DataFrame, spine: DataFrame): DataFrame = {

    val lastVisit = latestAsOf(visits, spine, "visit_date", Seq("visit_id"))
      .select(col("patient_id").as("v_pid"), col("as_of").as("v_asof"),
        col("visit_date"), col("next_appt"))
    val lastDisp = latestAsOf(pharmacy, spine, "dispense_date",
        Seq("disp_id", "disp_sub"))
      .select(col("patient_id").as("d_pid"), col("as_of").as("d_asof"),
        col("dispense_date"), col("expected_return"))
    val lastExit = latestAsOf(exits, spine, "exit_date", Seq("exit_id"))
      .select(col("patient_id").as("x_pid"), col("as_of").as("x_asof"),
        col("exit_date"), col("exit_reason"))
    val lastDisc = latestAsOf(disc, spine, "disc_date", Seq("disc_id"))
      .select(col("patient_id").as("c_pid"), col("as_of").as("c_asof"),
        col("disc_date"))
    val firstVisit = visits.groupBy(col("patient_id").as("f_pid"))
      .agg(min(col("visit_date")).as("first_visit"))

    // J7 — full outer: a patient-month may have only visits, only
    // dispenses, or both (vw_PatientLastEncounter shape).
    val enc = lastVisit.join(lastDisp,
        col("v_pid") <=> col("d_pid") && col("v_asof") <=> col("d_asof"),
        "full_outer")
      .select(
        coalesce(col("v_pid"), col("d_pid")).as("e_pid"),
        coalesce(col("v_asof"), col("d_asof")).as("e_asof"),
        greatest(col("visit_date"), col("dispense_date")).as("last_encounter"),
        greatest(col("next_appt"), col("expected_return")).as("next_expected0"))
      // Fix-up rule (reference :183-196): an implausibly far next
      // appointment (>= 365 days past the last encounter) is replaced
      // by last_encounter + 30.
      .withColumn("next_expected",
        when(datediff(col("next_expected0"), col("last_encounter")) >= 365,
          date_add(col("last_encounter"), 30))
        .otherwise(col("next_expected0")))

    // Patient x month universe; months broadcast (tiny dimension).
    val universe = patients.select(col("patient_id"))
      .join(broadcast(spine))

    val full = universe
      .join(enc, col("patient_id") <=> col("e_pid") &&
        col("as_of") <=> col("e_asof"), "left")
      .join(lastExit, col("patient_id") <=> col("x_pid") &&
        col("as_of") <=> col("x_asof"), "left")
      .join(lastDisc, col("patient_id") <=> col("c_pid") &&
        col("as_of") <=> col("c_asof"), "left")
      .join(firstVisit, col("patient_id") <=> col("f_pid"), "left")

    // Ordered CASE — the order IS the semantics (reference :197-232).
    val outcome =
      when(col("disc_date").isNotNull, lit("V"))
        .when(col("exit_date").isNotNull,
          upper(substring(col("exit_reason"), 1, 1)))
        .when(col("first_visit").isNull || col("first_visit") > col("as_of"),
          lit("NP"))
        .when(col("next_expected").isNull, lit("NV"))
        .when(datediff(col("as_of"), col("next_expected")) > 30, lit("uL"))
        .otherwise(lit("V"))

    full.select(col("patient_id"), col("as_of"),
      col("last_encounter"), col("next_expected"), outcome.as("outcome"))
  }
}
