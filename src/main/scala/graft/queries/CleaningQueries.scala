package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{Cleaning, LookupRemap}
import EtlQueries.{cents, centsSql, iso}

/** Oracle-checked queries for the expression-cleaning family (SURVEY
  * §2.3 E1-E16), the lookup-remap joins (§2.4 J1/J2/J4/J6/J8) and the
  * small projection ops (§2.2 P2/P6, §2.8 U1′). Dirty values are
  * derived deterministically from the testdata (same derivation in the
  * oracle SQL) because the driver tables are clean by construction.
  *
  * All outputs are BIGINT/VARCHAR only — see EtlQueries's
  * canonicalization rule.
  */
object CleaningQueries {

  // Injected "today" for deterministic date clamping (SURVEY §7.4 r4).
  private val Lo = LocalDate.of(1995, 6, 1)
  private val Today = LocalDate.of(1999, 12, 31)

  /** E1/E2/E3 — date clamp to sentinel, null-out, and future-bounded
    * next-appointment clamp, over orders.o_orderdate (1995..2001 in the
    * testdata, so both bounds fire). */
  def dateClamp(spark: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      iso(Cleaning.clampDate(Lo, Today)(d)).as("d_clamped"),
      iso(Cleaning.nullOutsideDate(Lo, Today)(d)).as("d_nulled"),
      iso(Cleaning.futureBounded(Lo, Today)(date_add(d, 370)))
        .as("next_appt"))
  }

  /** E4 — numeric clamp -> 999 on a double column and on a
    * varchar-typed numeric (the reference's Weight/Height are varchar
    * compared via float cast); non-numeric strings cast to NULL and
    * pass through. */
  def numericClamp(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // Deterministic varchar numeric + a non-numeric slice.
    val asStr = when(col("event_id") % 7 === 0, lit("notnum"))
      .otherwise(cents(col("value")).cast("string"))
    ev.select(
      col("event_id"),
      cents(Cleaning.clampNum(0d, 150d)(col("value"))).as("value_clamped_c"),
      cents(Cleaning.clampNum(0d, 20000d)(asStr)).as("str_clamped_c"))
  }

  /** E6/E15/E12 — empty-string -> null, sentinel-date -> null, and
    * coalesce fill. */
  def nullCleaning(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dirtyType = when(col("event_type") === "view", lit(""))
      .otherwise(col("event_type"))
    val dirtyDate = when(col("event_id") % 13 === 0, lit("0001-01-01"))
      .otherwise(date_format(col("ts"), "yyyy-MM-dd"))
    ev.select(
      col("event_id"),
      Cleaning.fillNull("(missing)")(Cleaning.emptyToNull(dirtyType))
        .as("etype_filled"),
      Cleaning.sentinelToNull("0001-01-01")(dirtyDate).as("day_clean"))
  }

  /** E5/E7/E8 — ordered CASE-IN canonicalization of the priority vocab
    * plus an exact recode of the status codes. */
  def vocabCanonicalize(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      Cleaning.canonicalize(Seq(
        Seq("1-URGENT", "2-HIGH") -> "HIGH",
        Seq("3-MEDIUM") -> "MEDIUM",
        Seq("4-NOT SPECIFIED", "5-LOW") -> "LOW"))(col("o_orderpriority"))
        .as("priority_canon"),
      Cleaning.recode(Map(
        "O" -> "Open", "F" -> "Finished", "P" -> "Pending"))(
        col("o_orderstatus")).as("status_name"))

  /** E16/E10/U1′ — dual-format date repair with the reference's
    * UNION-of-two-parse-strategies shape (CleanTestKits.sql): ISO rows
    * parse via the default cast, dd/MM/yyyy rows via the explicit
    * format, garbage drops out; the two branches are unioned + distinct. */
  def dualFormatDates(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dirty = when(col("event_id") % 3 === 0,
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .when(col("event_id") % 3 === 1,
        date_format(col("ts"), "dd/MM/yyyy HH:mm:ss"))
      .otherwise(lit("not a date"))
    val base = ev.select(col("event_id"), dirty.as("raw"))
    val isoParsed = base
      .withColumn("parsed", to_timestamp(col("raw")))
      .filter(col("parsed").isNotNull)
    val dmyParsed = base
      .withColumn("parsed", to_timestamp(col("raw"), "dd/MM/yyyy HH:mm:ss"))
      .filter(col("parsed").isNotNull)
    isoParsed.union(dmyParsed).distinct()
      .select(col("event_id"),
        date_format(col("parsed"), "yyyy-MM-dd HH:mm:ss").as("parsed"))
  }

  /** E13/E14/P2 — string functions, date arithmetic (day-diff and
    * T-SQL-style year-part diff), and the computed LoadDate projection
    * with an injected run date. */
  def stringDateFuncs(spark: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      substring(col("o_orderpriority"), 1, 1).as("prio_code"),
      length(col("o_orderpriority")).cast("long").as("prio_len"),
      upper(col("o_orderstatus")).as("status_u"),
      iso(date_add(d, 30)).as("d_plus30"),
      iso(last_day(d)).as("month_end"),
      datediff(d, lit("1995-01-01").cast("date")).cast("long")
        .as("days_since_epoch"),
      (year(d) - lit(1992)).cast("long").as("years_since_1992"),
      lit("2026-08-12").as("load_date"))
  }

  /** P6 — deterministic top-k (the reference ships a `top 10`; we pin
    * an explicit order so the result is well-defined). */
  def topkLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
      .orderBy(col("price_c").desc, col("o_orderkey").asc)
      .limit(10)

  /** J1/J4 — lookup-dim remap with post-join overwrite: customers
    * joined to their nation name (inner J4), then the name remapped
    * through a partial lookup (regions 0-2 only, so both the hit and
    * miss paths fire). */
  def vocabRemap(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val lkp = nation.filter(col("n_regionkey") < 3)
      .select(col("n_name").as("source_name"),
        concat(lit("CANON_"), upper(col("n_name"))).as("target_name"))
    val src = cust.join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation_name"))
    LookupRemap.remap(src.withColumn("nation_clean", col("nation_name")),
        lkp, "nation_clean")
      .select("c_custkey", "nation_name", "nation_clean")
  }

  /** J2/J6 — the same lookup remapped onto TWO columns (supplier nation
    * and customer nation of each lineitem), reference's self-alias
    * multi-join; the route to the customer nation goes through left
    * joins. */
  def multiRemap(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_orderkey") % 20 === 0)
      .select("l_orderkey", "l_linenumber", "l_suppkey")
    val sup = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val nation = Tables.nation(spark, dir)
    val lkp = nation.filter(col("n_regionkey") < 3)
      .select(col("n_name").as("source_name"),
        concat(lit("CANON_"), upper(col("n_name"))).as("target_name"))
    val supN = nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    val custN = nation.select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"))
    val joined = li
      .join(sup, col("l_suppkey") === col("s_suppkey"), "left")
      .join(supN, col("s_nationkey") === col("sn_key"), "left")
      .join(ord, col("l_orderkey") === col("o_orderkey"), "left")
      .join(cust, col("o_custkey") === col("c_custkey"), "left")
      .join(custN, col("c_nationkey") === col("cn_key"), "left")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("supp_nation"), col("cust_nation"))
    LookupRemap.remapAll(joined, lkp, Seq("supp_nation", "cust_nation"))
  }

  /** J8 — theta predicates inside the join condition (left join so the
    * non-matching side is observable). */
  def thetaJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    ord.join(cust,
        col("o_custkey") === col("c_custkey") &&
        col("c_acctbal") > lit(5000d) &&
        col("o_orderstatus") =!= lit("F"), "left")
      .select(col("o_orderkey"),
        when(col("c_custkey").isNotNull, lit(1L)).otherwise(lit(0L))
          .as("matched"),
        cents(col("c_acctbal")).as("acctbal_c"))
  }

  /** P5 — DISTINCT projection (53 of 54 reference source queries start
    * `SELECT DISTINCT`). */
  def distinctProjection(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()

  /** A2 — group-collapse with MAX(CAST(date)): latest referral-style
    * date per (entity, category), all other columns grouped
    * (LoadHtsClientLinkages shape). */
  def groupCollapse(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(col("ts").cast("date")).as("last_d"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("event_type"),
        iso(col("last_d")).as("last_day_iso"), col("n"))

  /** Semi-structured extraction — `events.props` is a JSON document
    * column (the shape every log/crawl pipeline carries). Two
    * extraction paths, both Catalyst-native and null-on-garbage under
    * the session's pre-ANSI semantics: a TYPED parse through a declared
    * schema (`from_json` -> struct, the bulk-ETL path: one parse per
    * row no matter how many fields are pulled) and a JSONPath string
    * extractor (`get_json_object`, the ad-hoc path). A missing path
    * yields NULL, not an error — asserted by the `missing_attr` column
    * riding along. At scale this is a pure projection: no shuffle, and
    * the parse cost is the scan cost. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
      col("event_id"), col("event_type"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
        .getField("k").as("k"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.missing").as("missing_attr"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "json_extract"        -> (jsonExtract _),
    "distinct_projection" -> (distinctProjection _),
    "group_collapse"      -> (groupCollapse _),
    "date_clamp"        -> (dateClamp _),
    "numeric_clamp"     -> (numericClamp _),
    "null_cleaning"     -> (nullCleaning _),
    "vocab_canonicalize" -> (vocabCanonicalize _),
    "dual_format_dates" -> (dualFormatDates _),
    "string_date_funcs" -> (stringDateFuncs _),
    "topk_limit"        -> (topkLimit _),
    "vocab_remap"       -> (vocabRemap _),
    "multi_remap"       -> (multiRemap _),
    "theta_join"        -> (thetaJoin _)
  )

  private val lkpSql =
    """SELECT n_name AS source_name, 'CANON_' || upper(n_name) AS target_name
      |FROM nation WHERE n_regionkey < 3""".stripMargin

  val oracles: Map[String, String] = Map(
    "json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract_string(props, '$.missing') AS missing_attr
        |FROM events""".stripMargin,
    "distinct_projection" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "group_collapse" ->
      """SELECT user_id, event_type,
        |       strftime(max(CAST(ts AS DATE)), '%Y-%m-%d') AS last_day_iso,
        |       count(*) AS n
        |FROM events GROUP BY user_id, event_type""".stripMargin,
    "date_clamp" ->
      """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT o_orderkey,
        |  strftime(CASE WHEN d < DATE '1995-06-01' OR d > DATE '1999-12-31'
        |       THEN DATE '1900-01-01' ELSE d END, '%Y-%m-%d') AS d_clamped,
        |  strftime(CASE WHEN d < DATE '1995-06-01' OR d > DATE '1999-12-31'
        |       THEN NULL ELSE d END, '%Y-%m-%d') AS d_nulled,
        |  strftime(CASE WHEN d + 370 < DATE '1995-06-01' OR d + 370 > DATE '2000-12-31'
        |       THEN DATE '1900-01-01' ELSE d + 370 END, '%Y-%m-%d') AS next_appt
        |FROM o""".stripMargin,
    "numeric_clamp" ->
      s"""WITH ev AS (
        |  SELECT event_id, value,
        |         CASE WHEN event_id % 7 = 0 THEN 'notnum'
        |              ELSE CAST(${centsSql.format("value")} AS VARCHAR) END AS s
        |  FROM events
        |), c AS (
        |  SELECT event_id,
        |         CASE WHEN value < 0 OR value > 150 THEN 999 ELSE value END AS vc,
        |         CASE WHEN try_cast(s AS DOUBLE) < 0 OR try_cast(s AS DOUBLE) > 20000
        |              THEN 999 ELSE try_cast(s AS DOUBLE) END AS sc
        |  FROM ev
        |)
        |SELECT event_id,
        |       ${centsSql.format("vc")} AS value_clamped_c,
        |       ${centsSql.format("sc")} AS str_clamped_c
        |FROM c""".stripMargin,
    "null_cleaning" ->
      """WITH ev AS (
        |  SELECT event_id,
        |    CASE WHEN event_type = 'view' THEN '' ELSE event_type END AS t,
        |    CASE WHEN event_id % 13 = 0 THEN '0001-01-01'
        |         ELSE strftime(ts, '%Y-%m-%d') END AS d
        |  FROM events
        |)
        |SELECT event_id,
        |  coalesce(CASE WHEN t = '' THEN NULL ELSE t END, '(missing)') AS etype_filled,
        |  CASE WHEN d = '0001-01-01' THEN NULL ELSE d END AS day_clean
        |FROM ev""".stripMargin,
    "vocab_canonicalize" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'HIGH'
        |       WHEN o_orderpriority IN ('3-MEDIUM') THEN 'MEDIUM'
        |       WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN 'LOW'
        |       ELSE o_orderpriority END AS priority_canon,
        |  CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished'
        |       WHEN 'P' THEN 'Pending' ELSE o_orderstatus END AS status_name
        |FROM orders""".stripMargin,
    "dual_format_dates" ->
      """WITH dirty AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
        |         WHEN event_id % 3 = 1 THEN strftime(ts, '%d/%m/%Y %H:%M:%S')
        |         ELSE 'not a date' END AS raw
        |  FROM events
        |), a AS (
        |  SELECT event_id, try_cast(raw AS TIMESTAMP) AS parsed FROM dirty
        |  WHERE try_cast(raw AS TIMESTAMP) IS NOT NULL
        |), b AS (
        |  SELECT event_id, try_strptime(raw, '%d/%m/%Y %H:%M:%S') AS parsed
        |  FROM dirty WHERE try_strptime(raw, '%d/%m/%Y %H:%M:%S') IS NOT NULL
        |)
        |SELECT event_id, strftime(parsed, '%Y-%m-%d %H:%M:%S') AS parsed
        |FROM (SELECT * FROM a UNION SELECT * FROM b)""".stripMargin,
    "string_date_funcs" ->
      """WITH o AS (SELECT *, CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT o_orderkey,
        |  substr(o_orderpriority, 1, 1) AS prio_code,
        |  CAST(len(o_orderpriority) AS BIGINT) AS prio_len,
        |  upper(o_orderstatus) AS status_u,
        |  strftime(d + 30, '%Y-%m-%d') AS d_plus30,
        |  strftime(last_day(d), '%Y-%m-%d') AS month_end,
        |  CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT) AS days_since_epoch,
        |  CAST(year(d) - 1992 AS BIGINT) AS years_since_1992,
        |  '2026-08-12' AS load_date
        |FROM o""".stripMargin,
    "topk_limit" ->
      s"""SELECT o_orderkey, ${centsSql.format("o_totalprice")} AS price_c
        |FROM orders
        |ORDER BY price_c DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "vocab_remap" ->
      s"""WITH lkp AS ($lkpSql)
        |SELECT c_custkey, n_name AS nation_name,
        |       coalesce(lkp.target_name, n_name) AS nation_clean
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN lkp ON n_name = lkp.source_name""".stripMargin,
    "multi_remap" ->
      s"""WITH lkp AS ($lkpSql)
        |SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
        |       coalesce(ls.target_name, sn.n_name) AS supp_nation,
        |       coalesce(lc.target_name, cn.n_name) AS cust_nation
        |FROM lineitem l
        |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |LEFT JOIN lkp ls ON sn.n_name = ls.source_name
        |LEFT JOIN lkp lc ON cn.n_name = lc.source_name
        |WHERE l.l_orderkey % 20 = 0""".stripMargin,
    "theta_join" ->
      s"""SELECT o_orderkey,
        |       CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END AS matched,
        |       ${centsSql.format("c_acctbal")} AS acctbal_c
        |FROM orders LEFT JOIN customer
        |  ON o_custkey = c_custkey AND c_acctbal > 5000 AND o_orderstatus <> 'F'""".stripMargin
  )
}
