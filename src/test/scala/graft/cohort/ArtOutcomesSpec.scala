package graft.cohort

import java.time.LocalDate

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Branch-coverage golden test for the ART-outcome CASE — one crafted
  * patient per branch (SURVEY §7.4 risk 5: branch ORDER is semantic),
  * plus the 365-day next-appointment fix-up rule, over a single-month
  * spine (as-of 2024-01-31). Branch order and conditions mirror
  * `LoadHistoricalARTOutcomes.sql:211-222`: a discontinuation fires 'V'
  * only when its reason is not 'DIED' AND its effective date is in the
  * FUTURE of the as-of month; 'NP' outranks the exit letter; the exit
  * letter is the raw (not uppercased) first character; the fix-up
  * anchors on the as-of date (`:192`). */
class ArtOutcomesSpec extends SparkSpec {

  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  // (patient, visit_date, visit_id, next_appt)
  private def visits: DataFrame = Seq(
    (1L, d("2024-01-10"), 10L, Option(d("2024-02-09"))),  // disc'd (future)
    (2L, d("2024-01-10"), 11L, Option(d("2024-02-09"))),  // exits anyway
    (4L, d("2024-03-15"), 12L, Option(d("2024-04-14"))),  // first visit AFTER as-of
    (5L, d("2024-01-05"), 13L, None),                     // no appointment scheduled
    (6L, d("2023-10-01"), 14L, Option(d("2023-10-31"))),  // >30 days late
    (7L, d("2024-01-20"), 15L, Option(d("2024-02-19"))),  // active
    (8L, d("2023-12-01"), 16L, Option(d("2025-06-01"))),  // implausible appt -> fix-up
    (9L, d("2024-01-10"), 17L, Option(d("2024-02-09"))),  // DIED disc must NOT fire
    (11L, d("2024-03-15"), 18L, Option(d("2024-04-14")))) // NP outranks exit
    .toDF("patient_id", "visit_date", "visit_id", "next_appt")

  private def pharmacy: DataFrame = Seq.empty[(Long, java.sql.Date, java.sql.Date, Long, Long)]
    .toDF("patient_id", "dispense_date", "expected_return", "disp_id", "disp_sub")

  private def exits: DataFrame = Seq(
    (2L, d("2024-01-15"), "transfer", 101L),
    (9L, d("2024-01-15"), "moved", 102L),
    (11L, d("2024-01-15"), "transfer", 103L))
    .toDF("patient_id", "exit_date", "exit_reason", "exit_id")

  // (patient, disc_date = EffectiveDiscontinuationDate, reason, id)
  private def disc: DataFrame = Seq(
    (1L, d("2024-06-01"), "STOPPED", 200L), // future, not DIED -> branch 1
    (9L, d("2024-06-01"), "DIED", 201L),    // future but DIED  -> falls through
    (10L, d("2024-01-10"), "STOPPED", 202L)) // PAST            -> falls through
    .toDF("patient_id", "disc_date", "disc_reason", "disc_id")

  private def patients: DataFrame = (1L to 11L).toDF("patient_id")

  private lazy val result: Map[Long, (String, Option[String])] = {
    val spine = ArtOutcomes.monthEndSpine(spark,
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 1))
    ArtOutcomes.outcomes(patients, visits, pharmacy, exits, disc, spine)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(4),
        Option(r.getDate(3)).map(_.toString)))
      .toMap
  }

  test("future-dated effective discontinuation wins (branch 1)") {
    assert(result(1L)._1 == "V")
  }
  test("DIED discontinuation falls through to the exit letter") {
    assert(result(9L)._1 == "m")
  }
  test("past-dated discontinuation falls through (no facts -> NV)") {
    assert(result(10L)._1 == "NV")
  }
  test("exit -> first letter of reason, raw case") {
    assert(result(2L)._1 == "t")
  }
  test("never visited, no facts at all -> NV (universe superset)") {
    assert(result(3L)._1 == "NV")
  }
  test("first visit after as-of -> NP") {
    assert(result(4L)._1 == "NP")
  }
  test("NP outranks the exit letter (branch order :214-216)") {
    assert(result(11L)._1 == "NP")
  }
  test("visited but no appointment scheduled -> NV") {
    assert(result(5L)._1 == "NV")
  }
  test("more than 30 days past appointment -> uL") {
    assert(result(6L)._1 == "uL")
  }
  test("active with upcoming appointment -> V") {
    assert(result(7L)._1 == "V")
  }
  test("365-day fix-up (anchored on as-of) replaces implausible appointment") {
    // raw appt 2025-06-01 is >= 365 days past as-of 2024-01-31: replaced
    // by last_encounter (2023-12-01) + 30 = 2023-12-31 -> >30 days late -> uL
    assert(result(8L)._2.contains("2023-12-31"))
    assert(result(8L)._1 == "uL")
  }
  test("plausible appointment is NOT fixed up (patient 7 keeps raw date)") {
    assert(result(7L)._2.contains("2024-02-19"))
  }

  test("encounter-driven membership == full universe minus no-encounter rows") {
    // The reference-literal variant must be EXACTLY the full-universe
    // output restricted to rows with a visit-or-dispense encounter
    // (last_encounter non-null): same payloads, same outcomes — only
    // membership differs. Multi-month spine so mid-spine arrivals
    // (patient 4 appears in March) exercise the boundary.
    val spine = ArtOutcomes.monthEndSpine(spark,
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 6, 1))
    def rows(encounterUniverse: Boolean) =
      ArtOutcomes.outcomes(patients, visits, pharmacy, exits, disc, spine,
          encounterUniverse)
        .collect()
        .map(r => (r.getLong(0), String.valueOf(r.getDate(1)),
          Option(r.getDate(2)).map(_.toString),
          Option(r.getDate(3)).map(_.toString), r.getString(4)))
        .toSet
    val full = rows(encounterUniverse = false)
    val ref = rows(encounterUniverse = true)
    assert(ref == full.filter(_._3.nonEmpty),
      "ref variant must equal the full universe filtered to encounters")
    // And it is a strict subset here: patient 3 (never visited) and
    // patient 4's pre-March months exist only in the full universe.
    assert(ref.size < full.size)
    assert(!ref.exists(_._1 == 3L) && full.exists(_._1 == 3L))
  }

  test("driver-side spineBounds literals produce exactly the aggregate " +
      "path's rows (r19: removes the bounds aggregate + broadcasts)") {
    // Multi-month spine + facts straddling both bounds: patient 10's
    // 2023 dispense folds into the lo bucket, future-dated facts drop
    // at hi — the two places the (lo, hi) values are load-bearing.
    val (from, to) = (LocalDate.of(2024, 1, 1), LocalDate.of(2024, 6, 1))
    val spine = ArtOutcomes.monthEndSpine(spark, from, to)
    def rows(bounds: Option[(LocalDate, LocalDate)]) =
      ArtOutcomes.outcomes(patients, visits, pharmacy, exits, disc, spine,
          encounterUniverse = false, spineBounds = bounds)
        .collect()
        .map(r => (r.getLong(0), String.valueOf(r.getDate(1)),
          Option(r.getDate(2)).map(_.toString),
          Option(r.getDate(3)).map(_.toString), r.getString(4)))
        .toSet
    assert(rows(Some((from, to))) == rows(None),
      "literal spine bounds must be row-identical to the aggregate path")
  }
}
