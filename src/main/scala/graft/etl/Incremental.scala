package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** New-record detection: source MINUS target on a composite key, with
  * null-safe equality — the reference's signature operator, present in
  * all 52 incremental jobs as a SQL `LEFT ANTI JOIN ... ON a <=> b`
  * (reference: `Load CT Patients Job/src/main/java/org/kenyahmis/
  * loadctpatients/LoadCTPatients.java:182-183`; key catalog in
  * SURVEY.md Appendix A).
  *
  * Why `<=>` (null-safe) and not `===`: key components are nullable
  * varchars in the ODS; a plain equi-anti-join treats NULL != NULL, so
  * rows with a null key component would be re-inserted on every run.
  *
  * Scale notes (100 TB):
  *  - The anti-join shuffles both sides on the key hash; with AQE on,
  *    skewed keys are split at runtime. When the target is small
  *    (bootstrap loads), pass `broadcastTarget = true` to turn it into
  *    a broadcast-hash anti-join with zero shuffle of the source.
  *  - Only the KEY COLUMNS of the target are needed — we project them
  *    before the join so the target scan is column-pruned to the key
  *    set (a full-width scan of a 100 TB target would dominate cost).
  */
object Incremental {

  /** Rows of `source` whose composite key is absent from `target`.
    * The target's key columns are renamed before the join so the
    * condition stays unambiguous even when `target` is derived from
    * `source` (self-referential lineage would otherwise resolve both
    * sides of `<=>` to the same attribute).
    *
    * `strictKeys` names components compared with plain `=` instead of
    * `<=>` — one reference job mixes the two (`Load MNCH Immunization/
    * .../LoadMNCHImmunization.java:67-68` joins `s.ID = t.ID` amid
    * `<=>` components), with the consequence that a row whose strict
    * component is NULL never matches the target and is re-inserted on
    * every run. That is the reference's live behavior, so literal
    * parity requires reproducing it on request — default stays
    * all-null-safe. */
  def newRecords(
      source: DataFrame,
      target: DataFrame,
      keys: Seq[String],
      broadcastTarget: Boolean = false,
      dedupTarget: Boolean = false,
      strictKeys: Set[String] = Set.empty): DataFrame = {
    // Column-prune the target to its key set — the part that matters at
    // 100 TB (a full-width scan of the target would dominate cost).
    // Deduping the build side is OPT-IN only: left_anti is insensitive
    // to build-side duplicates and the ODS target keys are de-facto
    // primary keys, so the extra shuffle+aggregate would usually buy
    // zero row reduction. Enable it only when the target is known to
    // hold heavy key duplication AND is not being broadcast.
    val tgtProj = target.select(keys.map(k => col(k).as(s"__tgt_$k")): _*)
    val tgtKeys0 =
      if (dedupTarget) tgtProj.dropDuplicates(keys.map(k => s"__tgt_$k"))
      else tgtProj
    val tgtKeys = if (broadcastTarget) broadcast(tgtKeys0) else tgtKeys0
    val cond: Column = keys.map { k =>
      if (strictKeys.contains(k)) col(k) === col(s"__tgt_$k")
      else col(k) <=> col(s"__tgt_$k")
    }.reduce(_ && _)
    source.join(tgtKeys, cond, "left_anti")
  }

  /** [[newRecords]] for a HOT-KEY-SKEWED delta — the shape the
    * reference's signature anti-join meets first at 100 TB: one
    * facility (SiteCode) contributes a dominant share of the day's
    * rows, and when the anti-join key set is low-cardinality (site, or
    * site+date), every hot row hashes to ONE shuffle partition whose
    * task then carries the whole facility alone while the rest of the
    * cluster idles. AQE's skew-join splitting covers sort-merge plans
    * it can see at runtime; this is the explicit, deterministic form
    * that also works under shuffled-hash plans and documents the
    * technique.
    *
    * Construction: each SOURCE row gets a deterministic salt in
    * [0, buckets) hashed from `saltSource` (per-row-distinct column(s)
    * — NOT rand(): retries must be idempotent and reruns reproducible);
    * the TARGET is column-pruned to its distinct key set, then
    * replicated once per salt value. The join key becomes
    * (keys..., salt), so the hot key's source rows spread over
    * `buckets` partitions while matching stays exact: a source row's
    * (k, s) finds a target row iff k is in the target key set, because
    * every target key exists at EVERY salt. Null-safe semantics and
    * `strictKeys` mirror [[newRecords]].
    *
    * Cost model: the replicated side is `buckets x |distinct target
    * keys|` — for the low-cardinality keys that cause this skew in the
    * first place (sites, site-dates) that is kilobytes; for
    * high-cardinality keys the plain [[newRecords]] hash already
    * distributes fine and salting buys nothing. The target side is
    * hinted to a shuffle join deliberately: if the distinct key set
    * were broadcastable there'd be no shuffle to salt — use
    * `broadcastTarget = true` on [[newRecords]] instead. */
  def newRecordsSalted(
      source: DataFrame,
      target: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      buckets: Int = 16,
      strictKeys: Set[String] = Set.empty): DataFrame = {
    require(buckets > 1, s"need >1 salt buckets, got $buckets")
    val salted = source.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets.toLong)))
    // Distinct BEFORE replication: dedup once, replicate the survivors.
    val tgtKeys = target
      .select(keys.map(k => col(k).as(s"__tgt_$k")): _*)
      .dropDuplicates(keys.map(k => s"__tgt_$k"))
      .withColumn("__tgt_salt",
        explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
      .hint("merge") // model the non-broadcastable target (see scaladoc)
    val cond: Column = (keys.map { k =>
      if (strictKeys.contains(k)) col(k) === col(s"__tgt_$k")
      else col(k) <=> col(s"__tgt_$k")
    } :+ (col("__salt") === col("__tgt_salt"))).reduce(_ && _)
    salted.join(tgtKeys, cond, "left_anti").drop("__salt")
  }

  /** Single LongType digest of a composite key for Bloom membership.
    * xxhash64 folds children left-to-right and SKIPS null children
    * (accumulator unchanged), so two rows that match under `<=>`
    * (componentwise both-null-or-equal) always digest identically —
    * the Bloom filter can therefore never produce a false NEGATIVE for
    * a null-safe match, which is the property the exactness argument
    * below rests on. Collisions (distinct keys, same digest) are just
    * false positives and are screened out by the exact anti-join. */
  private def keyDigest(keys: Seq[String]): Column = xxhash64(keys.map(col): _*)

  /** Optimal Bloom bit count for `n` items at false-positive rate
    * `fpp`: m = -n ln(fpp) / (ln 2)^2, floored at 64 bits and capped
    * at the session's `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumBits` (default 2^26 = 8 MiB) so the driver-side sketch
    * stays broadcast-sized no matter what a caller passes. The cap
    * must be the SESSION's limit, not a constant: Spark's
    * `BloomFilterAggregate` silently `min`-clamps `numBits` to that
    * conf, so requesting more bits than it allows would not fail —
    * it would quietly deliver roughly double the requested false-
    * positive rate on large deltas (pruning efficiency, not
    * exactness: the exact anti-join screens all Bloom positives). */
  private[etl] def bloomNumBits(n: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val maxBits = try {
      import org.apache.spark.sql.internal.SQLConf
      SQLConf.get.getConf(SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    } catch { case scala.util.control.NonFatal(_) => 1L << 26 }
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.min(math.max(m, 64L), maxBits)
  }

  /** Distributed Bloom build over `df`'s composite-key digest: one
    * column-pruned scan + a partial-merge aggregate (Catalyst's
    * `BloomFilterAggregate`, the engine behind Spark's own runtime
    * row-level filtering), collected to the driver as one serialized
    * sketch of at most 16 MiB. Returns null iff `df` has no rows. */
  private def buildBloom(df: DataFrame, keys: Seq[String],
      expectedItems: Long, fpp: Double): Array[Byte] =
    df.select(call_function("graft_bloom_agg", keyDigest(keys),
        lit(expectedItems), lit(bloomNumBits(expectedItems, fpp))).as("bf"))
      .head.getAs[Array[Byte]](0)

  /** Bloom-filter SEMI-JOIN REDUCTION of the incremental anti-join —
    * the 100 TB form of the reference's signature operator. The daily
    * source delta is orders of magnitude smaller than the accumulated
    * target (the reference's ODS holds every row ever loaded), yet
    * [[newRecords]] shuffles BOTH sides on the key hash, so the target
    * shuffle dominates cost and grows without bound as history
    * accumulates.
    *
    * This variant builds a Bloom filter over the SOURCE keys (one
    * map-side-combining aggregate over the small delta, driver sketch
    * <= 16 MiB) and pre-filters the target scan with `might_contain`
    * before the join: a target key that fails the membership test
    * cannot equal any source key, and a target row that matches no
    * source row contributes nothing to a LEFT ANTI join, so dropping
    * it cannot change the result. False POSITIVES merely retain
    * harmless extra target rows; false NEGATIVES are impossible
    * (same-digest property on [[keyDigest]]). The result is therefore
    * EXACTLY [[newRecords]] for any filter quality, while the target's
    * shuffle volume drops from |history| to ~|delta| * (1 + fpp).
    *
    * The membership predicate sits directly above the target's scan
    * (plan-asserted in `BloomIncrementalSpec`), so at 100 TB the
    * reduction happens before the exchange — the only full-width pass
    * over the target is the column-pruned key scan inside the Bloom
    * probe itself, and with a columnar format that scan touches only
    * the key columns.
    *
    * `expectedSourceItems` sizes the sketch (pass the delta's
    * approximate row count; an underestimate only raises fpp, never
    * breaks exactness). */
  def newRecordsBloom(
      source: DataFrame,
      target: DataFrame,
      keys: Seq[String],
      expectedSourceItems: Long,
      fpp: Double = 0.01,
      strictKeys: Set[String] = Set.empty): DataFrame = {
    val bloom = buildBloom(source, keys, expectedSourceItems, fpp)
    if (bloom == null) {
      // Empty source: the anti-join is empty regardless of the target,
      // so skip the target scan entirely (limit(0) prunes it).
      newRecords(source, target.limit(0), keys, strictKeys = strictKeys)
    } else {
      val pruned = target.filter(
        call_function("graft_might_contain", lit(bloom), keyDigest(keys)))
      newRecords(source, pruned, keys, strictKeys = strictKeys)
    }
  }

  /** Bloom-filter SHUFFLE BYPASS for append-mostly workloads — the
    * complementary direction to [[newRecordsBloom]]. When most source
    * rows are genuinely new (event streams, crawl frontiers,
    * dedup-against-registry), the anti-join shuffles a huge source
    * side only to discover that almost nothing matches. Here the Bloom
    * filter is built over the TARGET keys, and source rows whose key
    * FAILS the membership test are provably absent from the target —
    * they are results and bypass the join entirely, never entering an
    * exchange. Only the `might_contain` sliver (true duplicates plus
    * an fpp fraction of the new rows) goes through the exact
    * anti-join. Exact for any filter quality: the bypass branch admits
    * no false negatives, and the sliver branch is the real anti-join.
    *
    * The two branches re-scan the source, but both scans are
    * column-pruned + predicate-filtered columnar reads, which at scale
    * cost far less than the exchange they replace; cache `source`
    * first if it is an expensive derived frame. */
  def newRecordsBloomBypass(
      source: DataFrame,
      target: DataFrame,
      keys: Seq[String],
      expectedTargetItems: Long,
      fpp: Double = 0.01,
      strictKeys: Set[String] = Set.empty): DataFrame = {
    val bloom = buildBloom(target, keys, expectedTargetItems, fpp)
    if (bloom == null) source // empty target: every source row is new
    else {
      val might = call_function("graft_might_contain", lit(bloom), keyDigest(keys))
      val sliver = newRecords(source.filter(might), target, keys,
        strictKeys = strictKeys)
      sliver.unionByName(source.filter(!might))
    }
  }
}
