package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.cohort.ArtOutcomes
import EtlQueries.iso

/** Oracle-checked queries for the cohort engine: month spine (U2′),
  * full-outer last-encounter combine (J7), and the complete as-of
  * ART-outcome computation (§3.3 — the reference's cursor-loop T-SQL,
  * re-expressed set-based).
  *
  * Role mapping onto the testdata: customers are the patient universe,
  * orders are clinical visits (next appointment = visit + 30 days,
  * unscheduled when status 'P'), lineitems are pharmacy dispenses
  * (expected return = ship + 90 days), 'error'/'signup' events are care
  * exits and 'purchase' events are effective discontinuations, with a
  * deterministic event date derived from event_id so the streams
  * overlap the 1995-2001 order timeline.
  */
object CohortQueries {

  private def eventDate = // deterministic date in [1995-01-01, 2000-06-23]
    date_add(lit("1995-01-01").cast("date"), (col("event_id") % 2000).cast("int"))
  private val eventDateSql =
    "DATE '1995-01-01' + CAST(event_id % 2000 AS INTEGER)"

  /** U2′ — month-end spine spanning the orders date range, with an
    * arithmetic month index (idx computable identically in both
    * engines, unlike positional explode order). */
  def monthSpine(spark: SparkSession, dir: String): DataFrame = {
    val mm = Tables.orders(spark, dir).agg(
      trunc(min(col("o_orderdate").cast("date")), "MM").as("lo"),
      trunc(max(col("o_orderdate").cast("date")), "MM").as("hi"))
    mm.select(col("lo"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("m"))
      .select(
        ((year(col("m")) - year(col("lo"))) * 12 +
          (month(col("m")) - month(col("lo")))).cast("long").as("idx"),
        iso(last_day(col("m"))).as("month_end"))
  }

  /** J7 — standalone full-outer last-encounter: latest order per
    * customer vs latest event per user, keys coalesced. */
  def fullOuterEncounter(spark: SparkSession, dir: String): DataFrame = {
    // Native-date MAX (map-side combine, int agg buffer ->
    // HashAggregate, plan-asserted in PlanAuditSpec). Only the date is
    // kept, so no ordering struct is needed — a struct-typed buffer
    // (max(struct)/max_by) would push the whole aggregation to
    // SortAggregate and sort every input row per partition. */
    val lastOrder = Tables.orders(spark, dir)
      .withColumn("d", col("o_orderdate").cast("date"))
      .groupBy(col("o_custkey"))
      .agg(max(col("d")).as("last_order"))
      .select(col("o_custkey").as("o_pid"), col("last_order"))
    val lastEvent = Tables.events(spark, dir)
      .withColumn("ed", eventDate)
      .groupBy(col("user_id"))
      .agg(max(col("ed")).as("last_event"))
      .select(col("user_id").as("e_pid"), col("last_event"))
    lastOrder.join(lastEvent, col("o_pid") <=> col("e_pid"), "full_outer")
      .select(
        coalesce(col("o_pid"), col("e_pid")).as("patient_id"),
        iso(col("last_order")).as("last_order"),
        iso(col("last_event")).as("last_event"),
        when(col("o_pid").isNotNull && col("e_pid").isNotNull, lit("both"))
          .when(col("o_pid").isNotNull, lit("order_only"))
          .otherwise(lit("event_only")).as("src"))
  }

  /** §3.3 — the full multi-month as-of cohort over 1998. */
  def artOutcome(spark: SparkSession, dir: String): DataFrame =
    artOutcomeImpl(spark, dir, encounterUniverse = false)

  /** Reference-literal membership variant: rows only for patient-months
    * with >= 1 visit-or-dispense encounter as of the month (the
    * reference's `last_encounter`-driven insert,
    * `LoadHistoricalARTOutcomes.sql:158-182,234-243`) — what a
    * migration user diffing against the live ODS sees. Same outcome
    * semantics; the full-universe form is the superset. */
  def artOutcomeRef(spark: SparkSession, dir: String): DataFrame =
    artOutcomeImpl(spark, dir, encounterUniverse = true)

  private def artOutcomeImpl(spark: SparkSession, dir: String,
      encounterUniverse: Boolean): DataFrame = {
    val (spineFrom, spineTo) = (LocalDate.of(1998, 1, 1), LocalDate.of(1998, 12, 1))
    val spine = ArtOutcomes.monthEndSpine(spark, spineFrom, spineTo)
    val patients = Tables.customer(spark, dir)
      .select(col("c_custkey").as("patient_id"))
    // 'P' orders model unscheduled visits; urgent orders model the
    // data-entry garbage the reference's :192 fix-up exists for (an
    // appointment ~400 days out).
    val visits = Tables.orders(spark, dir).select(
      col("o_custkey").as("patient_id"),
      col("o_orderdate").cast("date").as("visit_date"),
      col("o_orderkey").as("visit_id"),
      when(col("o_orderstatus") === "P", lit(null))
        .when(col("o_orderpriority") === "1-URGENT",
          date_add(col("o_orderdate").cast("date"), 400))
        .otherwise(date_add(col("o_orderdate").cast("date"), 30)).as("next_appt"))
    val pharmacy = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        col("o_custkey").as("patient_id"),
        col("l_shipdate").cast("date").as("dispense_date"),
        date_add(col("l_shipdate").cast("date"), 90).as("expected_return"),
        col("l_orderkey").as("disp_id"), col("l_linenumber").as("disp_sub"))
    val ev = Tables.events(spark, dir)
    val exits = ev.filter(col("event_type").isin("error", "signup")).select(
      col("user_id").as("patient_id"), eventDate.as("exit_date"),
      col("event_type").as("exit_reason"), col("event_id").as("exit_id"))
    // Every 5th purchase models a 'DIED' exit reason so the disc
    // branch's `<> 'DIED'` guard (reference :212) is exercised.
    val disc = ev.filter(col("event_type") === "purchase").select(
      col("user_id").as("patient_id"), eventDate.as("disc_date"),
      when(col("event_id") % 5 === 0, lit("DIED")).otherwise(lit("STOPPED"))
        .as("disc_reason"),
      col("event_id").as("disc_id"))
    ArtOutcomes.outcomes(patients, visits, pharmacy, exits, disc, spine,
        encounterUniverse,
        // The spine is built from these same literals: threading them
        // removes the spine-bounds aggregate job + two broadcast
        // exchanges from the plan (ArtOutcomes.outcomes doc).
        spineBounds = Some((spineFrom, spineTo)))
      .select(col("patient_id"), iso(col("as_of")).as("as_of"),
        iso(col("last_encounter")).as("last_encounter"),
        iso(col("next_expected")).as("next_expected"), col("outcome"))
  }

  /** The as-of join inputs: events (left, each needing its latest
    * preceding order) and orders deduped to one row per (customer,
    * day) so the as-of match is deterministic. */
  private def asofSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), eventDate.as("e_d"))
    val ords = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("o_d"),
        col("o_orderkey"))
      .groupBy(col("o_custkey"), col("o_d"))
      .agg(max(col("o_orderkey")).as("o_key"))
    (ev, ords)
  }

  private def asofProject(j: DataFrame): DataFrame =
    j.select(col("event_id"), col("user_id"), iso(col("e_d")).as("event_day"),
      col("o_key").as("matched_order"), iso(col("o_d")).as("order_day"))

  /** The custom AS-OF JOIN operator ([[graft.plans.AsOfJoin]] — logical
    * node + planner strategy + sort-merge physical exec): each event
    * matches the latest order on or before its day, per customer, LEFT
    * OUTER. Oracle = DuckDB's native `ASOF LEFT JOIN` — a fully
    * independent implementation of the same operator. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val (ev, ords) = asofSides(spark, dir)
    asofProject(graft.plans.AsOf.join(
      ev, ords, Seq("user_id"), Seq("o_custkey"), "e_d", "o_d"))
  }

  /** Composition baseline for the same semantics: fan-out inequality
    * join (every event duplicated per candidate order — the row blow-up
    * the dedicated operator exists to avoid) + latest-pick. Same
    * oracle as [[asofJoin]]; the bench gap is the operator's win. */
  def asofJoinFanout(spark: SparkSession, dir: String): DataFrame = {
    val (ev, ords) = asofSides(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
      .orderBy(col("o_d").desc_nulls_last, col("o_key").desc_nulls_last)
    asofProject(
      ev.join(ords, col("user_id") === col("o_custkey") &&
          col("o_d") <= col("e_d"), "left")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1))
  }

  /** Zero-shuffle broadcast plan for the same as-of semantics. Same
    * oracle again. The left side keeps its scan partitioning through
    * the join (that's the point), so the single-split events file is
    * spread first — at real scale the left side arrives in thousands
    * of splits and needs no help. Honest bench note: at sf0.1 the
    * right side (~150k (customer, day) rows) is PAST the broadcast
    * sweet spot — the driver build + broadcast serialization cost
    * more than the two exchanges they replace, and the sort-merge
    * form measures faster. The broadcast plan's win is architectural
    * and grows with |left|/|right|: zero shuffle of the 100 TB side
    * (plan-asserted in AsOfJoinSpec) vs a full re-exchange of it. */
  def asofJoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val (ev, ords) = asofSides(spark, dir)
    asofProject(graft.plans.AsOf.join(
      Tables.spread(ev), ords, Seq("user_id"), Seq("o_custkey"), "e_d", "o_d",
      broadcastRight = true))
  }

  /** Binned range join ([[graft.etl.RangeJoin]]): each event matched
    * to every same-customer order whose 30-day follow-up window
    * contains it — the "encounter within the monitoring window"
    * temporal pattern. The bin width (32 days ≈ the interval length)
    * keeps the interval fan-out at <= 2 rows while the join itself is
    * a pure equi-join on (customer, bin). */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1990-01-01").cast("date")
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"),
      datediff(eventDate, epoch).cast("long").as("t"))
    val iv = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), epoch).cast("long").as("s"))
      .withColumn("e", col("s") + 30L)
    graft.etl.RangeJoin.pointInInterval(ev, iv,
        Seq("user_id"), Seq("o_custkey"), "t", "s", "e", 32L)
      .select(col("event_id"), col("o_orderkey"),
        (col("t") - col("s")).as("days_after"))
  }

  /** Retention cohort matrix — the product-analytics staple over the
    * event stream: users grouped by their FIRST-activity period,
    * counted in every period they remain active, keyed by offset. The
    * single-shuffle formulation: ONE groupBy(user) aggregates both the
    * cohort period (min) and the distinct active-period set
    * (collect_set over truncated timestamps — bounded by the calendar,
    * not by event volume, thanks to in-aggregate dedup), then
    * explode + re-aggregate over (cohort, offset). The naive
    * formulation — first-activity frame JOIN distinct-activity frame,
    * then COUNT(DISTINCT user) — costs three exchanges and a
    * distinct-aggregate; this one costs two, and the second is over
    * |cohorts x offsets| partial counts (map-side combined), not
    * users. */
  def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // Daily grain: the event table spans ~30 days, so days are the
    // cohort unit with signal (monthly would collapse to one cell);
    // the shape is identical at any grain.
    val perUser = ev
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .groupBy("user_id")
      .agg(min(col("d")).as("cohort_d"), collect_set(col("d")).as("days"))
    perUser
      .select(col("cohort_d"), explode(col("days")).as("act_d"))
      .groupBy(col("cohort_d"),
        datediff(col("act_d"), col("cohort_d")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(iso(col("cohort_d")).as("cohort_day"),
        col("day_offset"), col("n_users"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "retention_cohort"     -> (retentionCohort _),
    "month_spine"          -> (monthSpine _),
    "full_outer_encounter" -> (fullOuterEncounter _),
    "art_outcome"          -> (artOutcome _),
    "art_outcome_ref"      -> (artOutcomeRef _),
    "asof_join"            -> (asofJoin _),
    "asof_join_fanout"     -> (asofJoinFanout _),
    "asof_join_broadcast"  -> (asofJoinBroadcast _),
    "range_join"           -> (rangeJoin _)
  )

  private val asofOracle: String =
    s"""WITH ev AS (
      |  SELECT event_id, user_id, $eventDateSql AS e_d FROM events
      |), o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_d,
      |         max(o_orderkey) AS o_key
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT ev.event_id, ev.user_id,
      |       strftime(ev.e_d, '%Y-%m-%d') AS event_day,
      |       o.o_key AS matched_order,
      |       strftime(o.o_d, '%Y-%m-%d') AS order_day
      |FROM ev ASOF LEFT JOIN o
      |  ON ev.user_id = o.o_custkey AND ev.e_d >= o.o_d""".stripMargin

  val oracles: Map[String, String] = Map(
    // Independent formulation: join + COUNT(*) over per-user distinct
    // activity months instead of the engine's collect_set/explode.
    "retention_cohort" ->
      """WITH fu AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_d
        |  FROM events GROUP BY user_id
        |), act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_d FROM events
        |)
        |SELECT strftime(f.cohort_d, '%Y-%m-%d') AS cohort_day,
        |       CAST(date_diff('day', f.cohort_d, a.act_d) AS BIGINT) AS day_offset,
        |       count(*) AS n_users
        |FROM fu f JOIN act a USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    // Same native-ASOF oracle for the operator and its composition
    // baseline — both must agree with DuckDB's independent ASOF JOIN.
    "asof_join" -> asofOracle,
    "asof_join_fanout" -> asofOracle,
    "asof_join_broadcast" -> asofOracle,
    // Independent formulation: plain inequality join (DuckDB plans its
    // own IEJoin) vs the engine's bin-bucketed equi-join.
    "range_join" ->
      s"""WITH ev AS (
        |  SELECT event_id, user_id,
        |         date_diff('day', DATE '1990-01-01', $eventDateSql) AS t
        |  FROM events
        |), iv AS (
        |  SELECT o_orderkey, o_custkey,
        |         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS s
        |  FROM orders
        |)
        |SELECT ev.event_id, iv.o_orderkey,
        |       CAST(ev.t - iv.s AS BIGINT) AS days_after
        |FROM ev JOIN iv
        |  ON ev.user_id = iv.o_custkey
        | AND iv.s <= ev.t AND ev.t <= iv.s + 30""".stripMargin,
    "month_spine" ->
      """WITH mm AS (
        |  SELECT date_trunc('month', CAST(min(o_orderdate) AS DATE)) AS lo,
        |         date_trunc('month', CAST(max(o_orderdate) AS DATE)) AS hi
        |  FROM orders
        |), s AS (
        |  SELECT lo, CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS m
        |  FROM mm
        |)
        |SELECT CAST((year(m) - year(lo)) * 12 + (month(m) - month(lo)) AS BIGINT) AS idx,
        |       strftime(last_day(m), '%Y-%m-%d') AS month_end
        |FROM s""".stripMargin,
    "full_outer_encounter" ->
      s"""WITH lo AS (
        |  SELECT * FROM (
        |    SELECT o_custkey AS o_pid, CAST(o_orderdate AS DATE) AS last_order,
        |           row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1
        |), le AS (
        |  SELECT * FROM (
        |    SELECT user_id AS e_pid, $eventDateSql AS last_event,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY $eventDateSql DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1
        |)
        |SELECT coalesce(o_pid, e_pid) AS patient_id,
        |       strftime(last_order, '%Y-%m-%d') AS last_order,
        |       strftime(last_event, '%Y-%m-%d') AS last_event,
        |       CASE WHEN o_pid IS NOT NULL AND e_pid IS NOT NULL THEN 'both'
        |            WHEN o_pid IS NOT NULL THEN 'order_only'
        |            ELSE 'event_only' END AS src
        |FROM lo FULL JOIN le ON o_pid = e_pid""".stripMargin,
    // Independent formulation: per-month fan-out joins + row_number
    // windows (the reference's own CTE shape) vs the engine's
    // bucket+forward-fill — a hash match is therefore evidence, not
    // self-confirmation. CASE order and conditions mirror
    // LoadHistoricalARTOutcomes.sql:211-222; the fix-up anchors on the
    // as-of date (:192); disc is latest over ALL time (:109-128).
    "art_outcome" -> artOutcomeOracle(encounterUniverse = false),
    // Reference-literal membership: the output skeleton is `enc`
    // itself (visit/dispense patient-months), not customer x spine.
    "art_outcome_ref" -> artOutcomeOracle(encounterUniverse = true)
  )

  private def artOutcomeOracle(encounterUniverse: Boolean): String = {
    val (universeFrom, u) =
      if (encounterUniverse) ("enc e", "e")
      else ("uni u\nLEFT JOIN enc e ON u.pid = e.pid AND u.as_of = e.as_of", "u")
    s"""WITH spine AS (
        |  SELECT last_day(CAST(unnest(generate_series(
        |    DATE '1998-01-01', DATE '1998-12-01', INTERVAL 1 MONTH)) AS DATE)) AS as_of
        |), visits AS (
        |  SELECT o_custkey AS pid, CAST(o_orderdate AS DATE) AS vdate, o_orderkey AS vid,
        |         CASE WHEN o_orderstatus = 'P' THEN NULL
        |              WHEN o_orderpriority = '1-URGENT' THEN CAST(o_orderdate AS DATE) + 400
        |              ELSE CAST(o_orderdate AS DATE) + 30 END AS next_appt
        |  FROM orders
        |), pharm AS (
        |  SELECT o.o_custkey AS pid, CAST(l.l_shipdate AS DATE) AS ddate,
        |         CAST(l.l_shipdate AS DATE) + 90 AS expret,
        |         l.l_orderkey AS did, l.l_linenumber AS dsub
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), exits AS (
        |  SELECT user_id AS pid, $eventDateSql AS xdate,
        |         event_type AS reason, event_id AS xid
        |  FROM events WHERE event_type IN ('error','signup')
        |), disc AS (
        |  SELECT user_id AS pid, $eventDateSql AS cdate,
        |         CASE WHEN event_id % 5 = 0 THEN 'DIED' ELSE 'STOPPED' END AS creason,
        |         event_id AS cid
        |  FROM events WHERE event_type = 'purchase'
        |), lv AS (
        |  SELECT pid, as_of, vdate, next_appt FROM (
        |    SELECT v.*, s.as_of, row_number() OVER (
        |        PARTITION BY v.pid, s.as_of ORDER BY v.vdate DESC, v.vid DESC) AS rn
        |    FROM visits v JOIN spine s ON v.vdate <= s.as_of) WHERE rn = 1
        |), ld AS (
        |  SELECT pid, as_of, ddate, expret FROM (
        |    SELECT p.*, s.as_of, row_number() OVER (
        |        PARTITION BY p.pid, s.as_of
        |        ORDER BY p.ddate DESC, p.did DESC, p.dsub DESC) AS rn
        |    FROM pharm p JOIN spine s ON p.ddate <= s.as_of) WHERE rn = 1
        |), lx AS (
        |  SELECT pid, as_of, xdate, reason FROM (
        |    SELECT x.*, s.as_of, row_number() OVER (
        |        PARTITION BY x.pid, s.as_of ORDER BY x.xdate DESC, x.xid DESC) AS rn
        |    FROM exits x JOIN spine s ON x.xdate <= s.as_of) WHERE rn = 1
        |), lc AS (
        |  SELECT pid, cdate, creason FROM (
        |    SELECT c.*, row_number() OVER (
        |        PARTITION BY c.pid ORDER BY c.cdate DESC, c.cid DESC) AS rn
        |    FROM disc c) WHERE rn = 1
        |), fv AS (
        |  SELECT pid, min(vdate) AS first_visit FROM visits GROUP BY pid
        |), enc AS (
        |  SELECT coalesce(lv.pid, ld.pid) AS pid,
        |         coalesce(lv.as_of, ld.as_of) AS as_of,
        |         greatest(lv.vdate, ld.ddate) AS last_encounter,
        |         CASE WHEN date_diff('day', coalesce(lv.as_of, ld.as_of),
        |                        greatest(lv.next_appt, ld.expret)) >= 365
        |              THEN greatest(lv.vdate, ld.ddate) + 30
        |              ELSE greatest(lv.next_appt, ld.expret) END AS next_expected
        |  FROM lv FULL JOIN ld ON lv.pid = ld.pid AND lv.as_of = ld.as_of
        |), uni AS (
        |  SELECT c_custkey AS pid, as_of FROM customer CROSS JOIN spine
        |)
        |SELECT $u.pid AS patient_id, strftime($u.as_of, '%Y-%m-%d') AS as_of,
        |       strftime(e.last_encounter, '%Y-%m-%d') AS last_encounter,
        |       strftime(e.next_expected, '%Y-%m-%d') AS next_expected,
        |       CASE WHEN lc.cdate IS NOT NULL AND lc.creason <> 'DIED'
        |                 AND lc.cdate > $u.as_of THEN 'V'
        |            WHEN fv.first_visit > $u.as_of THEN 'NP'
        |            WHEN lx.xdate IS NOT NULL THEN substr(lx.reason, 1, 1)
        |            WHEN $u.as_of < e.next_expected
        |                 OR date_diff('day', e.next_expected, $u.as_of) <= 30 THEN 'V'
        |            WHEN date_diff('day', e.next_expected, $u.as_of) > 30 THEN 'uL'
        |            WHEN e.next_expected IS NULL THEN 'NV'
        |            END AS outcome
        |FROM $universeFrom
        |LEFT JOIN lx ON $u.pid = lx.pid AND $u.as_of = lx.as_of
        |LEFT JOIN lc ON $u.pid = lc.pid
        |LEFT JOIN fv ON $u.pid = fv.pid""".stripMargin
  }
}
