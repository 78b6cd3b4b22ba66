package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.time.LocalDate

import graft.Tables
import graft.etl.{Cleaning, Dedup, Incremental, LookupRemap, PiiHash, Skew}

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

  /** Pinned instant for the point-in-time SCD2 snapshot — mid-range of
    * the events table's January-2024 span, so roughly half the keys
    * have opened an episode by then. */
  private val Scd2SnapshotAt = "2024-01-15 00:00:00"

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

  /** J3 at 100 TB — the same anti-join with Bloom semi-join reduction
    * (`Incremental.newRecordsBloom`): a sketch over the source keys
    * prunes the target before its exchange. Result-identical to
    * [[incrementalAntijoin]] by construction (false positives retain
    * harmless target rows; false negatives are impossible), so it
    * shares that query's oracle verbatim — a green hash here is a
    * machine check of the exactness argument, not just of the happy
    * path. */
  def incrementalBloom(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val source = orders.withColumn("cust_k", nullableCustkey(orders))
    val target = source.filter(col("o_orderkey") % 10 < 8)
    Incremental.newRecordsBloom(source, target, Seq("cust_k", "o_orderkey"),
        expectedSourceItems = 1L << 20)
      .select(
        col("o_orderkey"), col("cust_k"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("o_totalprice_c"),
        iso(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"))
  }

  /** J3 append-mostly direction — Bloom shuffle bypass
    * (`Incremental.newRecordsBloomBypass`): source rows provably
    * absent from the target skip the join entirely; only the
    * might-contain sliver anti-joins. Same oracle again: exactness
    * holds for any filter quality. */
  def incrementalBloomBypass(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val source = orders.withColumn("cust_k", nullableCustkey(orders))
    val target = source.filter(col("o_orderkey") % 10 < 8)
    Incremental.newRecordsBloomBypass(source, target, Seq("cust_k", "o_orderkey"),
        expectedTargetItems = 1L << 20)
      .select(
        col("o_orderkey"), col("cust_k"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("o_totalprice_c"),
        iso(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"))
  }

  /** SCD Type 2 historization (`etl/Scd2.historize`) over the event
    * stream: per user, one row per `event_type` EPISODE (consecutive
    * repeats collapse) with half-open validity `[valid_from, valid_to)`
    * and `is_current`. The oracle replays the same two-window
    * formulation in DuckDB; sub-second precision is preserved through
    * the windows (only the final output formats to seconds, identically
    * in both engines). */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    graft.etl.Scd2.historize(ev, keys = Seq("user_id"),
        tracked = Seq("event_type"), orderCols = Seq("ts", "event_id"),
        validCol = "ts")
      .select(col("user_id"), col("event_type"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("is_current").cast("long").as("is_current"))
  }

  /** Point-in-time dimension snapshot — the query SCD2 historization
    * exists to serve: reconstruct every key's state AT a pinned
    * instant from the episode table ([[graft.etl.Scd2.asOf]], a pure
    * range filter over the half-open validity intervals). Keys whose
    * history starts after the instant drop out; every covered key
    * yields exactly one row. At 100 TB the filter rides the history
    * scan and partition-prunes when the table is stored partitioned
    * on `valid_from` ranges. */
  def scd2Snapshot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val hist = graft.etl.Scd2.historize(ev, keys = Seq("user_id"),
      tracked = Seq("event_type"), orderCols = Seq("ts", "event_id"),
      validCol = "ts")
    graft.etl.Scd2.asOf(hist, to_timestamp(lit(Scd2SnapshotAt)))
      .select(col("user_id"), col("event_type"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss")
          .as("valid_from"))
  }

  /** Snapshot reconciliation (`etl/Diff.tableDiff`): yesterday = the
    * 80% slice, today = the 90% slice with priorities rewritten on a
    * deterministic subset — so all four change classes occur. The
    * oracle reproduces the classification with an independent
    * FULL OUTER JOIN + CASE formulation. */
  def tableDiffQ(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val oldSnap = orders.filter(col("o_orderkey") % 10 < 8)
    val newSnap = orders.filter(col("o_orderkey") % 10 > 0)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 7 === 0, lit("RECLASSIFIED"))
          .otherwise(col("o_orderpriority")))
    graft.etl.Diff.tableDiff(oldSnap, newSnap, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_orderpriority"))
      .select(col("o_orderkey"), col("change"))
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

  /** §3.1 flagship — the reference's COMPLETE incremental-load job
    * shape as one registered query (previously only smoke-checked via
    * `SparkEntry.entry`): scan -> expression cleaning (E1 date clamp,
    * E5 canonicalize, E7 recode) -> lookup remap with a real hit path
    * (J1) -> latest-record dedup (J5) -> null-safe anti-join against
    * the already-loaded slice (J3) -> PII hash (E9) -> explicit output
    * projection (P1). Every reference job is this pipeline with
    * different column sets (`Load CT Patients Job/.../
    * LoadCTPatients.java:49-202`); hash-matching the composition
    * end-to-end checks the stages AGREE on intermediate schemas and
    * null semantics, which the per-operator queries cannot see.
    *
    * Scale shape: the lookup join is broadcast (no fact shuffle), the
    * dedup is a map-side-combining max_by, and the anti-join shuffles
    * both sides once on the composite key — three stages total, none
    * quadratic, independent of fact width. (The anti-join target is
    * DERIVED from the dedup output here — a test-fixture stand-in for
    * the separately-stored ODS table a production run reads — so this
    * plan pays the dedup twice where production pays one dedup plus
    * one target scan; the oracle replays the same derivation.) */
  def referencePipeline(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val nation = Tables.nation(spark, dir)

    val cleaned = orders
      .withColumn("o_orderdate",
        Cleaning.clampDate(LocalDate.of(1995, 1, 1), LocalDate.of(2002, 1, 1))(
          col("o_orderdate").cast("date")))
      .withColumn("o_orderpriority",
        Cleaning.canonicalize(Seq(
          Seq("1-URGENT", "2-HIGH") -> "HIGH",
          Seq("3-MEDIUM") -> "MEDIUM",
          Seq("4-NOT SPECIFIED", "5-LOW") -> "LOW"))(col("o_orderpriority")))
      .withColumn("o_orderstatus",
        Cleaning.recode(Map("O" -> "Open", "F" -> "Finished", "P" -> "Pending"))(
          col("o_orderstatus")))
      // Derived vocabulary column with both hit and miss paths: 2/3 of
      // rows carry a real nation name the lookup remaps, 1/3 a value
      // the lookup misses (kept as-is) — exercising the overwrite-on-
      // hit/keep-on-miss branch the reference relies on.
      .withColumn("nation_src",
        when(col("o_orderkey") % 3 === 0, lit("NATION_5"))
          .when(col("o_orderkey") % 3 === 1, lit("NATION_17"))
          .otherwise(lit("UNMAPPED")))

    val lkp = nation.select(col("n_name").as("source_name"),
      concat(lit("N_"), col("n_name")).as("target_name"))
    val remapped = LookupRemap.remap(cleaned, lkp, "nation_src")

    val latest = Dedup.latestPerKey(remapped, Seq("o_custkey"),
      Seq("o_orderdate", "o_orderkey"))
    val target = latest.filter(col("o_orderkey") % 10 < 8)
    val fresh = Incremental.newRecords(latest, target,
      Seq("o_custkey", "o_orderkey"))

    PiiHash.hashColumns(fresh, Seq("o_custkey"))
      .select(col("o_orderkey"), col("o_custkeyHash"), col("o_orderstatus"),
        col("o_orderpriority"), col("nation_src"),
        iso(col("o_orderdate")).as("o_orderdate"))
  }

  /** The HLL sketch surface ([[graft.etl.Sketches]]) oracle-checked in
    * its deterministic envelope: fine-grained sketches per
    * (status, priority) are UNION-MERGED up to status — the mergeable-
    * column path an append-only warehouse relies on — and the rolled-up
    * estimate is asserted against the exact per-status distinct count
    * within the spec's 3-sigma band (3 * 1.04 / sqrt(2^lgK) ≈ 4.9% at
    * lgK=12). The estimate itself is hash-based and deterministic for
    * fixed data, but only the BOUND is the published contract, so the
    * oracle emits exact counts plus `true` literals — a sharper check
    * than rows-only, honest about what HLL promises. */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val sketches = graft.etl.Sketches.distinctSketch(orders, "o_custkey",
      Seq("o_orderstatus", "o_orderpriority"))
    val rolled = graft.etl.Sketches.rollupEstimate(sketches,
      Seq("o_orderstatus"))
    val exact = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    val relErr = 3.0 * 1.04 / math.sqrt((1 << 12).toDouble)
    exact.join(rolled, Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("n_exact"),
        (abs(col("estimate") - col("n_exact"))
          <= lit(relErr) * col("n_exact")).as("within_bound"))
  }

  /** The anti-join's own skew story (the signature op meets a hot
    * facility): source = the [[skewed]] frame (~99% of rows on
    * hot_key 0), target = the cold keys ending 800-999 removed, so the
    * anti-join is keyed on the LOW-CARDINALITY hot_key alone and the
    * hot key's entire mass hashes to one shuffle partition in the
    * plain plan. [[skewAntiSalted]] runs
    * [[graft.etl.Incremental.newRecordsSalted]] (deterministic source
    * salt, exploded distinct target keys, exact by construction);
    * [[skewAntiNoopt]] is the unsalted strawman pinned to the same
    * shuffle join. Both share one oracle — a green hash on both is a
    * machine check of the salted rewrite's exactness, and the bench
    * gap between them is the salting's measured win. */
  def skewAntiSalted(spark: SparkSession, dir: String): DataFrame = {
    val s = skewed(spark, dir)
    val t = s.filter(col("hot_key") =!= 0L && col("hot_key") % 1000 < 800)
    Incremental.newRecordsSalted(s, t, Seq("hot_key"),
        saltSource = col("v"), buckets = 16)
      .select(col("hot_key"), col("v"))
  }

  /** See [[skewAntiSalted]]. */
  def skewAntiNoopt(spark: SparkSession, dir: String): DataFrame = {
    val s = skewed(spark, dir)
    val t = s.filter(col("hot_key") =!= 0L && col("hot_key") % 1000 < 800)
    Incremental.newRecords(s, t.hint("merge"), Seq("hot_key"))
      .select(col("hot_key"), col("v"))
  }

  /** Declarative data-quality gate ([[graft.etl.Quality]]): eight
    * rules — batch size, key null counts, status domain violations,
    * future AND unparseable dates, duplicate keys, distinct
    * cardinalities — evaluated
    * in ONE aggregate pass and unpivoted to (metric, value). The
    * reference's 54 jobs load extracts unchecked; this is the
    * guardrail its 100 TB deployment needs. */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    import graft.etl.Quality._
    profile(Tables.orders(spark, dir), Seq(
      rowCount(),
      nullCount("o_custkey"),
      nullCount("o_orderdate"),
      domainViolations("o_orderstatus", Seq("F", "O", "P")),
      futureDates("o_orderdate", "1998-12-31"),
      unparseableDates("o_orderdate"),
      duplicateKeys("o_orderkey"),
      distinctCount("o_orderstatus")))
  }

  /** `DataFrameStatFunctions.freqItems` checked inside its published
    * contract: the sketch (a distributed Karp-Papadimitriou-Shenker
    * heavy-hitters pass) GUARANTEES every value with frequency above
    * the support threshold appears in the result — false positives
    * allowed, false negatives not. The query computes the exact
    * heavy hitters (> 25% support) and asserts each is found in the
    * sketch output; the oracle pins the exact hitters + true
    * literals (honest-envelope style). */
  def freqItemsBand(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    // NOTE: freqItems is EAGER — the KPS heavy-hitters job runs (and
    // collects its sketch) right here at DataFrame-construction time,
    // so constructing this query already costs one orders scan.
    val freq = orders.stat.freqItems(Seq("o_orderstatus"), 0.25)
      .select(col("o_orderstatus_freqItems").as("sketch_items"))
    // The threshold count, by contrast, stays relational (a 1-row
    // count frame cross-joined in), so the sketch scan above is the
    // ONLY construction-time job this query triggers.
    val n = orders.agg(count(lit(1)).as("__n"))
    val exactHot = orders.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(n)
      .filter(col("cnt") > col("__n") * 0.25)
    exactHot.crossJoin(freq)
      .select(col("o_orderstatus"), col("cnt").as("n_exact"),
        array_contains(col("sketch_items"), col("o_orderstatus"))
          .as("found"))
  }

  /** Fuzzy record linkage over the part catalog: brand-blocked name
    * pairs within edit distance 3 ([[graft.etl.Linkage.fuzzyPairs]]).
    * Blocking bounds the quadratic candidate space; the length-diff
    * prefilter prunes impossible pairs before the distance runs. */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame =
    // spread(): the part table arrives as ONE split, which would put
    // every in-block pair evaluation on a single core; the probe side
    // of the broadcast join carries the quadratic work, so it must be
    // partitioned across the session width.
    graft.etl.Linkage.fuzzyPairs(Tables.spread(Tables.part(spark, dir)),
      "p_partkey", "p_name", "p_brand", maxDist = 3)
      .select(col("id_a"), col("id_b"), col("dist"))

  /** The SAME linkage through length-banded blocking
    * ([[graft.etl.Linkage.fuzzyPairsBanded]]): the impossible-pair
    * pruning moves into the join key, so candidates that cannot meet
    * the threshold never materialize. Result set identical to
    * [[fuzzyMatch]] by construction — the registry shares the oracle
    * verbatim, making the hash a machine proof of the banding's exact
    * recall; SCALE.md carries the sf1 timing of both. */
  def fuzzyMatchBanded(spark: SparkSession, dir: String): DataFrame =
    graft.etl.Linkage.fuzzyPairsBanded(
      Tables.spread(Tables.part(spark, dir)),
      "p_partkey", "p_name", "p_brand", maxDist = 3)
      .select(col("id_a"), col("id_b"), col("dist"))

  /** The SAME linkage through PassJoin segment blocking
    * ([[graft.etl.Linkage.fuzzyPairsSegmented]]): "shares an exact
    * segment occurrence" becomes the join key, so within-block pairs
    * with no matching segment — the overwhelming majority — never
    * form. Result set identical to [[fuzzyMatch]] by the pigeonhole
    * argument; the registry shares the oracle verbatim, making the
    * hash a machine proof of exact recall. SCALE.md carries the sf1
    * timing against the unsegmented and length-banded forms. */
  def fuzzyMatchPassjoin(spark: SparkSession, dir: String): DataFrame =
    graft.etl.Linkage.fuzzyPairsSegmented(
      Tables.spread(Tables.part(spark, dir)),
      "p_partkey", "p_name", "p_brand", maxDist = 3)
      .select(col("id_a"), col("id_b"), col("dist"))

  /** The SAME linkage with ENGINE-CHOSEN blocking
    * ([[graft.etl.Linkage.fuzzyPairsAuto]]): block sizes are measured
    * first and only over-budget blocks take the finer banded key. The
    * budget (2500 candidate pairs per block) makes sf0.01's ~80-row
    * brand blocks split across BOTH branches (blocks over ~71 rows go
    * banded, the rest stay plain), so the shared-verbatim oracle hash
    * proves the routing union loses and duplicates nothing; at bench
    * scale every block is over budget and the query degenerates to
    * [[fuzzyMatchBanded]] — the engine picked the lever by itself. */
  def fuzzyMatchAuto(spark: SparkSession, dir: String): DataFrame =
    graft.etl.Linkage.fuzzyPairsAuto(
      Tables.spread(Tables.part(spark, dir)),
      "p_partkey", "p_name", "p_brand", maxDist = 3, pairBudget = 2500L)
      .select(col("id_a"), col("id_b"), col("dist"))

  /** Incremental aggregate maintenance proven equal to recompute:
    * "yesterday's" summary (orderkeys ending 0-7) merged with the
    * delta's summary (the rest) — one union + one |groups| aggregate,
    * history never re-read — against an oracle that aggregates the
    * FULL table directly. A green hash is a machine check of the
    * merge algebra ([[graft.etl.IncrementalAgg]]). */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.etl.IncrementalAgg._
    val orders = Tables.orders(spark, dir)
      .withColumn("price_c", cents(col("o_totalprice")))
    val keys = Seq("o_orderstatus")
    val metrics = Seq(
      countMetric(),
      sumMetric(col("price_c"), "sum_price_c"),
      minMetric(col("price_c"), "min_price_c"),
      maxMetric(col("price_c"), "max_price_c"))
    val yesterday = summarize(
      orders.filter(col("o_orderkey") % 10 < 8), keys, metrics)
    val delta = summarize(
      orders.filter(col("o_orderkey") % 10 >= 8), keys, metrics)
    merge(Seq(yesterday, delta), keys, metrics)
  }

  /** Graded fuzzy linkage: brand-blocked Jaro-Winkler pairs at or
    * above 0.90, scores in exact millionths. The native expression's
    * doubles are BIT-IDENTICAL to DuckDB's `jaro_winkler_similarity`
    * (fixture-verified in `StringSimilaritySpec`), so both the
    * threshold cut and the scaled scores hash-match exactly. */
  def jwMatch(spark: SparkSession, dir: String): DataFrame =
    graft.etl.Linkage.jaroWinklerPairs(
        Tables.spread(Tables.part(spark, dir)),
        "p_partkey", "p_name", "p_brand", minSim = 0.90)
      .select(col("id_a"), col("id_b"),
        floor(col("sim") * lit(1e6) + lit(0.5)).as("sim_ppm"))

  /** Schema-drift-tolerant union ([[graft.etl.SchemaDrift]]): batch A
    * is the expected shape; batch B drifted on all three axes —
    * `o_orderkey` retyped to varchar (with a corrupt slice that no
    * longer parses), `price_c` dropped, `o_orderpriority` added.
    * `conform` absorbs every axis: retype → try_cast (corrupt → NULL
    * key), missing → typed NULL, added → dropped. The oracle replays
    * the same conformance relationally. */
  def schemaDrift(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderkey") % 2 === 0).select(
      col("o_orderkey"),
      col("o_orderstatus").as("status"),
      cents(col("o_totalprice")).as("price_c"))
    val b = o.filter(col("o_orderkey") % 2 === 1).select(
      when(col("o_orderkey") % 1000 === 1,
          concat(lit("corrupt-"), col("o_orderkey")))
        .otherwise(col("o_orderkey").cast("string")).as("o_orderkey"),
      col("o_orderstatus").as("status"),
      col("o_orderpriority"))
    graft.etl.SchemaDrift.unionConformed(a, b)
  }

  /** The drift REPORT for [[schemaDrift]]'s batch pair — the
    * metadata surface a load job emits next to its appended count
    * (`Job.loadWithReport`). Schema-level, driver-side, deterministic;
    * the oracle pins the three expected drift rows as literals. */
  def schemaDriftReport(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val expected = o.select(
      col("o_orderkey"), col("o_orderstatus").as("status"),
      cents(col("o_totalprice")).as("price_c")).schema
    val actual = o.select(
      col("o_orderkey").cast("string").as("o_orderkey"),
      col("o_orderstatus").as("status"),
      col("o_orderpriority")).schema
    graft.etl.SchemaDrift.reportDf(spark, expected, actual)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "schema_drift"         -> (schemaDrift _),
    "schema_drift_report"  -> (schemaDriftReport _),
    "jw_match"             -> (jwMatch _),
    "incremental_agg"      -> (incrementalAgg _),
    "fuzzy_match"          -> (fuzzyMatch _),
    "fuzzy_match_banded"   -> (fuzzyMatchBanded _),
    "fuzzy_match_passjoin" -> (fuzzyMatchPassjoin _),
    "fuzzy_match_auto"     -> (fuzzyMatchAuto _),
    "scd2_snapshot"        -> (scd2Snapshot _),
    "dq_profile"           -> (dqProfile _),
    "freq_items_band"      -> (freqItemsBand _),
    "hll_distinct"         -> (hllDistinct _),
    "skew_anti_salted"     -> (skewAntiSalted _),
    "skew_anti_noopt"      -> (skewAntiNoopt _),
    "incremental_antijoin" -> (incrementalAntijoin _),
    "incremental_bloom"    -> (incrementalBloom _),
    "incremental_bloom_bypass" -> (incrementalBloomBypass _),
    "scd2_history"         -> (scd2History _),
    "table_diff"           -> (tableDiffQ _),
    "reference_pipeline"   -> (referencePipeline _),
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

  private val skewAntiOracle: String =
    """WITH s AS (
      |  SELECT CASE WHEN l_orderkey % 100 = 0 THEN l_orderkey ELSE 0 END
      |           AS hot_key,
      |         l_orderkey * 10 + l_linenumber AS v
      |  FROM lineitem
      |)
      |SELECT s.hot_key, CAST(s.v AS BIGINT) AS v FROM s
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM s t
      |  WHERE t.hot_key <> 0 AND t.hot_key % 1000 < 800
      |    AND t.hot_key = s.hot_key)""".stripMargin

  private val antijoinOracle: String =
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
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Conformance replayed relationally: even keys keep their price,
    // odd keys re-enter via varchar round-trip (corrupt slice -> NULL
    // key via TRY_CAST) with NULL price; the added column is absent.
    "schema_drift" ->
      s"""SELECT o_orderkey, o_orderstatus AS status,
        |       ${centsSql.format("o_totalprice")} AS price_c
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT TRY_CAST(CASE WHEN o_orderkey % 1000 = 1
        |                     THEN 'corrupt-' || o_orderkey
        |                     ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT),
        |       o_orderstatus,
        |       NULL
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin,
    // Schema-level metadata pinned as literals (types are Spark
    // simpleString names — the report is the engine's own surface).
    "schema_drift_report" ->
      """SELECT * FROM (VALUES
        |  ('o_orderkey', 'retyped', 'bigint', 'string'),
        |  ('o_orderpriority', 'added', 'absent', 'string'),
        |  ('price_c', 'missing', 'bigint', 'absent'))
        |  AS t("column", kind, expected_type, actual_type)""".stripMargin,
    // The HLL estimate is implementation-defined (Datasketches hash);
    // the PUBLISHED contract is the 3-sigma error band, so the oracle
    // pins the exact distinct counts and asserts the band held (true
    // literals) — see hllDistinct's scaladoc.
    "hll_distinct" ->
      """SELECT o_orderstatus,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
        |       true AS within_bound
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    // Full-table recompute: the incremental merge must hash-equal it.
    "incremental_agg" ->
      """SELECT o_orderstatus,
        |       count(*) AS n,
        |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |            AS BIGINT) AS sum_price_c,
        |       min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS min_price_c,
        |       max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS max_price_c
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "jw_match" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |       CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name)
        |            * 1e6 + 0.5) AS BIGINT) AS sim_ppm
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.90""".stripMargin,
    "fuzzy_match" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin,
    // Shared VERBATIM with fuzzy_match: the banded plan must produce
    // the identical pair set (exact recall), and the hash proves it.
    "fuzzy_match_banded" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin,
    // Shared VERBATIM with fuzzy_match: the per-block routing between
    // the plain and banded branches must lose and duplicate nothing.
    "fuzzy_match_auto" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin,
    // Shared VERBATIM with fuzzy_match: PassJoin's pigeonhole recall
    // guarantee is machine-proven by the identical hash.
    "fuzzy_match_passjoin" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin,
    "scd2_snapshot" ->
      s"""WITH marked AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    (lag(ts) OVER w IS NULL
        |     OR event_type IS DISTINCT FROM lag(event_type) OVER w) AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), ep AS (
        |  SELECT * FROM marked WHERE chg
        |), hist AS (
        |  SELECT user_id, event_type, ts AS vf, lead(ts) OVER w2 AS vt
        |  FROM ep
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id, event_type,
        |       strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from
        |FROM hist
        |WHERE vf <= TIMESTAMP '$Scd2SnapshotAt'
        |  AND (vt IS NULL OR TIMESTAMP '$Scd2SnapshotAt' < vt)""".stripMargin,
    "dq_profile" ->
      """WITH m AS (
        |  SELECT
        |    count(*) AS row_count,
        |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS null_o_custkey,
        |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
        |      AS null_o_orderdate,
        |    sum(CASE WHEN o_orderstatus IS NOT NULL
        |             AND o_orderstatus NOT IN ('F','O','P')
        |             THEN 1 ELSE 0 END) AS bad_o_orderstatus,
        |    sum(CASE WHEN TRY_CAST(o_orderdate AS DATE) > DATE '1998-12-31'
        |             THEN 1 ELSE 0 END) AS future_o_orderdate,
        |    sum(CASE WHEN o_orderdate IS NOT NULL
        |             AND TRY_CAST(o_orderdate AS DATE) IS NULL
        |             THEN 1 ELSE 0 END) AS unparseable_o_orderdate,
        |    count(o_orderkey) - count(DISTINCT o_orderkey) AS dup_o_orderkey,
        |    count(DISTINCT o_orderstatus) AS distinct_o_orderstatus
        |  FROM orders
        |)
        |SELECT 'row_count' AS metric, CAST(row_count AS BIGINT) AS value FROM m
        |UNION ALL SELECT 'null_o_custkey', CAST(null_o_custkey AS BIGINT) FROM m
        |UNION ALL SELECT 'null_o_orderdate', CAST(null_o_orderdate AS BIGINT) FROM m
        |UNION ALL SELECT 'bad_o_orderstatus', CAST(bad_o_orderstatus AS BIGINT) FROM m
        |UNION ALL SELECT 'future_o_orderdate', CAST(future_o_orderdate AS BIGINT) FROM m
        |UNION ALL SELECT 'unparseable_o_orderdate', CAST(unparseable_o_orderdate AS BIGINT) FROM m
        |UNION ALL SELECT 'dup_o_orderkey', CAST(dup_o_orderkey AS BIGINT) FROM m
        |UNION ALL SELECT 'distinct_o_orderstatus', CAST(distinct_o_orderstatus AS BIGINT) FROM m""".stripMargin,
    // The sketch's item list is implementation-defined beyond the
    // no-false-negatives contract; the oracle pins the exact heavy
    // hitters and asserts the contract held (see freqItemsBand).
    "freq_items_band" ->
      """WITH n AS (SELECT count(*) AS n FROM orders)
        |SELECT o_orderstatus, count(*) AS n_exact, true AS found
        |FROM orders, n
        |GROUP BY o_orderstatus, n.n
        |HAVING count(*) > n.n * 0.25""".stripMargin,
    // Salted and unsalted skewed anti-join share this oracle verbatim:
    // a green hash on BOTH machine-checks the salted rewrite's
    // exactness (same argument as the bloom pair).
    "skew_anti_salted" -> skewAntiOracle,
    "skew_anti_noopt"  -> skewAntiOracle,
    // The full §3.1 pipeline, stage by stage. The dedup is formulated
    // as row_number (the reference's user-facing idiom) rather than
    // max_by, so the oracle is an independent formulation of the same
    // semantics; `d DESC, o_orderkey DESC` is the total order the
    // Spark side's ordering struct induces (o_orderkey is unique).
    "reference_pipeline" ->
      """WITH cleaned AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN CAST(o_orderdate AS DATE) < DATE '1995-01-01'
        |           OR CAST(o_orderdate AS DATE) > DATE '2002-01-01'
        |         THEN DATE '1900-01-01' ELSE CAST(o_orderdate AS DATE) END AS d,
        |    CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'HIGH'
        |         WHEN o_orderpriority IN ('3-MEDIUM') THEN 'MEDIUM'
        |         WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN 'LOW'
        |         ELSE o_orderpriority END AS o_orderpriority,
        |    CASE WHEN o_orderstatus = 'O' THEN 'Open'
        |         WHEN o_orderstatus = 'F' THEN 'Finished'
        |         WHEN o_orderstatus = 'P' THEN 'Pending'
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'NATION_5'
        |         WHEN o_orderkey % 3 = 1 THEN 'NATION_17'
        |         ELSE 'UNMAPPED' END AS nation_src_raw
        |  FROM orders
        |), lkp AS (
        |  SELECT source_name, target_name FROM (
        |    SELECT n_name AS source_name, 'N_' || n_name AS target_name,
        |           row_number() OVER (PARTITION BY n_name) AS rn
        |    FROM nation) WHERE rn = 1
        |), remapped AS (
        |  SELECT c.o_orderkey, c.o_custkey, c.d, c.o_orderpriority,
        |         c.o_orderstatus,
        |         coalesce(l.target_name, c.nation_src_raw) AS nation_src
        |  FROM cleaned c LEFT JOIN lkp l ON c.nation_src_raw = l.source_name
        |), latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (
        |        PARTITION BY o_custkey ORDER BY d DESC, o_orderkey DESC) AS rn
        |    FROM remapped) WHERE rn = 1
        |)
        |SELECT s.o_orderkey,
        |       upper(sha256(CAST(s.o_custkey AS VARCHAR))) AS o_custkeyHash,
        |       s.o_orderstatus, s.o_orderpriority, s.nation_src,
        |       strftime(s.d, '%Y-%m-%d') AS o_orderdate
        |FROM latest s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM latest t WHERE t.o_orderkey % 10 < 8
        |    AND s.o_custkey IS NOT DISTINCT FROM t.o_custkey
        |    AND s.o_orderkey IS NOT DISTINCT FROM t.o_orderkey)""".stripMargin,
    "incremental_antijoin" -> antijoinOracle,
    // The Bloom variants are result-identical to the plain anti-join
    // BY DESIGN — sharing its oracle verbatim is the point: a green
    // hash machine-checks the semi-join-reduction exactness argument.
    "incremental_bloom" -> antijoinOracle,
    "incremental_bloom_bypass" -> antijoinOracle,
    "table_diff" ->
      """WITH oldsnap AS (
        |  SELECT o_orderkey, o_orderstatus, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 < 8
        |), newsnap AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'RECLASSIFIED'
        |         ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 > 0
        |)
        |SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |       WHEN n.o_orderkey IS NULL THEN 'removed'
        |       WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |         OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
        |         THEN 'changed'
        |       ELSE 'same' END AS change
        |FROM oldsnap o FULL OUTER JOIN newsnap n
        |  ON o.o_orderkey = n.o_orderkey""".stripMargin,
    "scd2_history" ->
      """WITH marked AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    (lag(ts) OVER w IS NULL
        |     OR event_type IS DISTINCT FROM lag(event_type) OVER w) AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), ep AS (
        |  SELECT * FROM marked WHERE chg
        |)
        |SELECT user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  CAST(lead(ts) OVER w2 IS NULL AS BIGINT) AS is_current
        |FROM ep
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
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
