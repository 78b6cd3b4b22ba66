package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{Dedup, Incremental, PiiHash, Skew}

/** Operator-parity queries over the driver's TPC-H-ish parquet tables
  * (role mapping per /root/repo/FIXTURES.md §B). Each entry here has a
  * DuckDB oracle in [[EtlQueries.oracles]]; names and output column
  * names must match the oracle exactly (driver sorts columns by name
  * before hashing).
  *
  * Canonicalization rule (round-2 fix): every query emits ONLY BIGINT
  * and VARCHAR columns. DECIMAL and DATE outputs hash-mismatched in
  * round 1 (driver canonicalizes them differently from DuckDB/Python);
  * BIGINT+VARCHAR passed. So:
  *   - money  -> integer cents via floor(x*100 + 0.5): IEEE multiply/
  *     add/floor are bit-identical in Spark and DuckDB, and it avoids
  *     the cast divergence (Spark truncates double->long, DuckDB
  *     rounds) by casting an already-integral double;
  *   - dates  -> ISO-8601 strings (date_format / strftime);
  *   - sums   -> per-row cents first, then sum of BIGINT (exact and
  *     partition-order-independent, unlike summing doubles).
  */
object EtlQueries {

  /** Spark side of the money->cents canonicalization. Spark's `floor`
    * on DoubleType already returns LongType. */
  def cents(c: Column): Column = floor(c * lit(100d) + lit(0.5d))

  /** DuckDB side of the same (floor returns DOUBLE there; the cast of
    * an integral double is exact). */
  val centsSql = "CAST(floor(%s * 100 + 0.5) AS BIGINT)"

  def iso(c: Column): Column = date_format(c.cast("date"), "yyyy-MM-dd")

  /** Derived nullable key used to exercise null-safe (`<=>`) semantics:
    * the testdata has no NULL keys, so we null out a deterministic
    * slice, mirrored exactly in the oracle SQL. */
  private def nullableCustkey(df: DataFrame) =
    when(col("o_custkey") % 11 === 0, lit(null)).otherwise(col("o_custkey"))

  /** J3 — incremental anti-join (SURVEY §2.4 J3): source minus target on
    * a null-safe composite key. Target = the deterministic "already
    * loaded" 80% slice. */
  def incrementalAntijoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val source = orders
      .withColumn("cust_k", nullableCustkey(orders))
    val target = source.filter(col("o_orderkey") % 10 < 8)
    Incremental.newRecords(source, target, Seq("cust_k", "o_orderkey"))
      .select(
        col("o_orderkey"), col("cust_k"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("o_totalprice_c"),
        iso(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"))
  }

  /** J5/W1 — latest-record-per-key dedup via window row_number (the
    * SURVEY §2.6 W1 mapping; the max_by-aggregate variant in
    * Dedup.latestPerKey is the better plan when keys are heavily
    * duplicated, but lineitem keys here are near-unique and the window
    * sort measures faster). */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
    Dedup.latestPerKeyWindow(li, Seq("l_orderkey", "l_partkey"),
        Seq("l_shipdate", "l_linenumber"))
      .select(
        col("l_orderkey"), col("l_partkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        iso(col("l_shipdate")).as("l_shipdate"),
        cents(col("l_quantity")).as("l_quantity_c"))
  }

  /** A1/A2 — grouped aggregation; sums are exact integer-cents sums so
    * the result is independent of partitioning/accumulation order.
    * Dates aggregate as native DateType (int buffer) and format AFTER
    * the agg: min/max over pre-formatted strings would buffer
    * UTF8Strings, degrade the whole aggregation to SortAggregate, and
    * pay per-row string formatting of every input instead of 6 output
    * rows (plan-asserted HashAggregate in PlanAuditSpec). ISO date
    * ordering == string ordering, so min/max commute with the
    * formatting. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_price_c"),
        min(col("l_shipdate").cast("date")).as("__min_ship"),
        max(col("l_shipdate").cast("date")).as("__max_ship"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
        col("sum_qty_c"), col("sum_price_c"),
        iso(col("__min_ship")).as("min_ship"),
        iso(col("__max_ship")).as("max_ship"))

  /** J5′ — reference-literal GROUP-BY-MAX dedup (`Load Source CT
    * Patients/.../LoadSourceCTPatients.sql:10-17`): keep rows matching
    * BOTH independent per-key maxima. Unlike `latest_per_key`, a key
    * whose max-date row and max-linenumber row are DIFFERENT rows
    * keeps neither (the drop-on-tie semantics this idiom is known
    * for); the row counts differ accordingly. */
  def maxFieldsDedupQ(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
    Dedup.maxFieldsDedup(li, Seq("l_orderkey", "l_partkey"),
        Seq("l_shipdate", "l_linenumber"))
      .select(
        col("l_orderkey"), col("l_partkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        iso(col("l_shipdate")).as("l_shipdate"),
        cents(col("l_quantity")).as("l_quantity_c"))
  }

  /** Deliberately skewed frame: ~99% of lineitem rows collapse onto
    * hot_key 0 (only orderkeys divisible by 100 keep their own key),
    * with a per-row-unique value — the "one hot GROUP BY key" shape
    * AQE cannot fix for aggregations (AQE's skew handling splits
    * JOIN partitions, not aggregation groups). */
  private def skewed(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      when(col("l_orderkey") % 100 === 0, col("l_orderkey")).otherwise(lit(0L))
        .as("hot_key"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("v"))

  /** THE skew killer, measured: latest-record-per-key as a row_number
    * WINDOW. Window functions cannot split a partition, so the hot
    * key's ~594k rows (sf0.1) sort in ONE task while 31 cores idle —
    * serialization that grows linearly with the hot key no matter the
    * cluster size. As of round 4 the engine's
    * [[graft.plans.RankOneToAggregate]] optimizer rule rewrites this
    * exact pattern into the max_by aggregate automatically, so this
    * query now BENCHES like [[skewLatestMaxby]] — that convergence is
    * the rule working. [[skewLatestRank]] keeps the un-rewritten
    * window plan measurable. */
  def skewLatestWindow(spark: SparkSession, dir: String): DataFrame =
    Dedup.latestPerKeyWindow(skewed(spark, dir), Seq("hot_key"), Seq("v"))

  /** The rewrite-immune strawman: the same row_number()=1 window but
    * ordered `desc_nulls_first` — on a non-null key that is
    * semantically identical to the default `desc_nulls_last`, yet
    * outside [[graft.plans.RankOneToAggregate]]'s null-ordering guard,
    * so the plan keeps the serial window sort. (rank() was tried first
    * and is NOT equivalent: the testdata seeds duplicate lineitem rows,
    * and tied rank-1 rows all survive.) This is what every
    * `skew_latest_*` query would cost without the rule; the bench gap
    * between this and [[skewLatestWindow]] IS the rule's measured win. */
  def skewLatestNoopt(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hot_key")).orderBy(col("v").desc_nulls_first)
    skewed(spark, dir).withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** The mitigation: `max_by` partial aggregation — every map task
    * pre-collapses its slice of the hot key to ONE candidate row, so
    * the shuffle moves ~32 rows per key instead of 594k and no task
    * inherits the whole hot partition. Same one-row-per-key result as
    * the window plan (v is unique per row, so the order is total). */
  def skewLatestMaxby(spark: SparkSession, dir: String): DataFrame =
    Dedup.latestPerKey(skewed(spark, dir), Seq("hot_key"), Seq("v"))

  /** Skew.saltedAgg wiring proof: per-key distinct-value sets built
    * with salt = hash(value), so each (key, salt) bucket holds a
    * DISJOINT slice of the set and the final pass just sums sizes.
    * At sf0.1 the plain collect_set's single-reducer merge is largely
    * absorbed by ObjectHashAggregate (~0.25 s of single-thread hash
    * inserts), so the bench pair reads near-even here — the salted
    * form is the 100 TB shape, where the hot set outgrows one
    * executor's heap; the serialized-sort penalty that IS measurable
    * at this scale is the `skew_latest_*` pair above. */
  def skewCollectUnsalted(spark: SparkSession, dir: String): DataFrame =
    skewed(spark, dir)
      .groupBy(col("hot_key"))
      .agg(size(collect_set(col("v"))).cast("long").as("n_distinct"))

  /** See [[skewCollectUnsalted]]. */
  def skewCollectSalted(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedAgg(skewed(spark, dir), Seq("hot_key"), col("v"), 16)(
      "n_distinct" -> (size(collect_set(col("v"))).cast("long"), sum(_)))

  /** Top-3 per hot key via the naive row_number()<=k window — the form
    * the engine's [[graft.plans.RankOneToAggregate]] rule rewrites into
    * the bounded-heap [[graft.plans.TopKByAgg]] partial aggregate: each
    * map task keeps at most 3 candidate rows for the hot key, so the
    * shuffle moves ~96 rows (32 tasks x 3) instead of the hot key's
    * ~594k, and no single task sorts the whole hot partition. */
  def skewCapTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hot_key")).orderBy(col("v").desc)
    skewed(spark, dir).withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 3)
      .select(col("hot_key"), col("v"), col("__rn").cast("long").as("keep_rank"))
  }

  /** The rewrite-immune strawman for [[skewCapTopk]]: identical query,
    * but ordered `desc_nulls_first` — semantically the same on the
    * non-null key, yet outside the rule's null-ordering guard, so the
    * plan keeps the serial hot-key window sort. The bench gap between
    * this and [[skewCapTopk]] is the row_number<=k rewrite's measured
    * win. */
  def skewCapNoopt(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hot_key")).orderBy(col("v").desc_nulls_first)
    skewed(spark, dir).withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 3)
      .select(col("hot_key"), col("v"), col("__rn").cast("long").as("keep_rank"))
  }

  /** E9/U1 — PII hash: UPPER(SHA2-256(string form)). */
  def piiHash(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name")
    PiiHash.hashColumns(c, Seq("c_custkey", "c_name"))
      .select("c_custkey", "c_custkeyHash", "c_nameHash")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "incremental_antijoin" -> (incrementalAntijoin _),
    "latest_per_key"       -> (latestPerKey _),
    "max_fields_dedup"     -> (maxFieldsDedupQ _),
    "pricing_summary"      -> (pricingSummary _),
    "pii_hash"             -> (piiHash _),
    "skew_collect_unsalted" -> (skewCollectUnsalted _),
    "skew_collect_salted"   -> (skewCollectSalted _),
    "skew_latest_window"    -> (skewLatestWindow _),
    "skew_latest_maxby"     -> (skewLatestMaxby _),
    "skew_latest_noopt"     -> (skewLatestNoopt _),
    "skew_cap_topk"         -> (skewCapTopk _),
    "skew_cap_noopt"        -> (skewCapNoopt _)
  )

  val oracles: Map[String, String] = Map(
    "incremental_antijoin" ->
      s"""WITH src AS (
        |  SELECT *, CASE WHEN o_custkey % 11 = 0 THEN NULL ELSE o_custkey END AS cust_k
        |  FROM orders
        |), tgt AS (
        |  SELECT * FROM src WHERE o_orderkey % 10 < 8
        |)
        |SELECT s.o_orderkey, s.cust_k, s.o_orderstatus,
        |       ${centsSql.format("s.o_totalprice")} AS o_totalprice_c,
        |       strftime(CAST(s.o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
        |       s.o_orderpriority
        |FROM src s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM tgt t
        |  WHERE s.cust_k IS NOT DISTINCT FROM t.cust_k
        |    AND s.o_orderkey IS NOT DISTINCT FROM t.o_orderkey
        |)""".stripMargin,
    "latest_per_key" ->
      s"""SELECT l_orderkey, l_partkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS l_shipdate,
        |       ${centsSql.format("l_quantity")} AS l_quantity_c
        |FROM (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY l_orderkey, l_partkey
        |      ORDER BY CAST(l_shipdate AS DATE) DESC, l_linenumber DESC
        |    ) AS rn
        |  FROM lineitem
        |) WHERE rn = 1""".stripMargin,
    // Independent formulation: the reference's own GROUP-BY-MAX
    // self-join (vs the engine's windowed rewrite) — a hash match is
    // evidence, not self-confirmation.
    "max_fields_dedup" ->
      s"""SELECT l.l_orderkey, l.l_partkey,
        |       CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
        |       strftime(CAST(l.l_shipdate AS DATE), '%Y-%m-%d') AS l_shipdate,
        |       ${centsSql.format("l.l_quantity")} AS l_quantity_c
        |FROM lineitem l
        |JOIN (
        |  SELECT l_orderkey, l_partkey,
        |         max(CAST(l_shipdate AS DATE)) AS msd,
        |         max(l_linenumber) AS mln
        |  FROM lineitem GROUP BY 1, 2
        |) m ON l.l_orderkey = m.l_orderkey AND l.l_partkey = m.l_partkey
        |   AND CAST(l.l_shipdate AS DATE) = m.msd AND l.l_linenumber = m.mln""".stripMargin,
    "pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        |       count(*) AS n_rows,
        |       CAST(sum(${centsSql.format("l_quantity")}) AS BIGINT) AS sum_qty_c,
        |       CAST(sum(${centsSql.format("l_extendedprice")}) AS BIGINT) AS sum_price_c,
        |       min(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS min_ship,
        |       max(strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')) AS max_ship
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // Identical oracle for both skew entries: the salted rewrite must
    // produce byte-identical counts to the plain aggregation.
    "skew_collect_unsalted" ->
      """SELECT CASE WHEN l_orderkey % 100 = 0 THEN l_orderkey ELSE 0 END AS hot_key,
        |       count(DISTINCT l_orderkey * 10 + l_linenumber) AS n_distinct
        |FROM lineitem GROUP BY 1""".stripMargin,
    "skew_collect_salted" ->
      """SELECT CASE WHEN l_orderkey % 100 = 0 THEN l_orderkey ELSE 0 END AS hot_key,
        |       count(DISTINCT l_orderkey * 10 + l_linenumber) AS n_distinct
        |FROM lineitem GROUP BY 1""".stripMargin,
    // Same oracle for both skew_latest entries: v is unique per row,
    // so "latest by v" is exactly max(v) per key in either plan.
    "skew_latest_window" ->
      """SELECT CASE WHEN l_orderkey % 100 = 0 THEN l_orderkey ELSE 0 END AS hot_key,
        |       max(l_orderkey * 10 + l_linenumber) AS v
        |FROM lineitem GROUP BY 1""".stripMargin,
    "skew_latest_maxby" ->
      """SELECT CASE WHEN l_orderkey % 100 = 0 THEN l_orderkey ELSE 0 END AS hot_key,
        |       max(l_orderkey * 10 + l_linenumber) AS v
        |FROM lineitem GROUP BY 1""".stripMargin,
    "skew_latest_noopt" ->
      """SELECT CASE WHEN l_orderkey % 100 = 0 THEN l_orderkey ELSE 0 END AS hot_key,
        |       max(l_orderkey * 10 + l_linenumber) AS v
        |FROM lineitem GROUP BY 1""".stripMargin,
    // Identical oracle for both skew_cap entries (v is unique per row,
    // so top-3-by-v is a total order): the TopKByAgg rewrite and the
    // serial window plan must produce byte-identical rows.
    "skew_cap_topk" ->
      """WITH s AS (
        |  SELECT CASE WHEN l_orderkey % 100 = 0 THEN l_orderkey ELSE 0 END AS hot_key,
        |         l_orderkey * 10 + l_linenumber AS v
        |  FROM lineitem
        |), r AS (
        |  SELECT hot_key, v,
        |         row_number() OVER (PARTITION BY hot_key ORDER BY v DESC) AS keep_rank
        |  FROM s
        |)
        |SELECT hot_key, v, CAST(keep_rank AS BIGINT) AS keep_rank
        |FROM r WHERE keep_rank <= 3""".stripMargin,
    "skew_cap_noopt" ->
      """WITH s AS (
        |  SELECT CASE WHEN l_orderkey % 100 = 0 THEN l_orderkey ELSE 0 END AS hot_key,
        |         l_orderkey * 10 + l_linenumber AS v
        |  FROM lineitem
        |), r AS (
        |  SELECT hot_key, v,
        |         row_number() OVER (PARTITION BY hot_key ORDER BY v DESC) AS keep_rank
        |  FROM s
        |)
        |SELECT hot_key, v, CAST(keep_rank AS BIGINT) AS keep_rank
        |FROM r WHERE keep_rank <= 3""".stripMargin,
    "pii_hash" ->
      """SELECT c_custkey,
        |       upper(sha256(CAST(c_custkey AS VARCHAR))) AS c_custkeyHash,
        |       upper(sha256(c_name)) AS c_nameHash
        |FROM customer""".stripMargin
  )
}
