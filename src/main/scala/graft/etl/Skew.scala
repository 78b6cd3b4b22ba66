package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale.
  *
  * AQE's runtime skew-join splitting handles most cases; these helpers
  * cover the patterns AQE cannot: a single hot GROUP BY key whose
  * partial aggregate still lands on one reducer, a shuffle join whose
  * hot build-side key must be replicated, and a blocked SELF-join
  * whose hot bucket serializes O(p²) COMPUTE in one task while staying
  * far under AQE's byte-based skew thresholds. Salting is
  * deterministic (hash of a tiebreak column, not rand()) so results
  * are reproducible and retries are safe — rand() in a salted pipeline
  * breaks task-retry idempotency.
  */
object Skew {

  /** Residents-per-bucket cap for [[selfPairsByBucket]] (and the
    * IVF tail's asymmetric variant,
    * [[graft.sim.Similarity.knnFromRanked]]): a bucket of pop p costs
    * O(p²) pair scores, and one over-populated bucket serializes that
    * work in a single task (measured at sf10: a 4645-resident IVF
    * cell vs a 1060 median max — the straggler behind a 2.2× tail).
    * AQE's skew-join split cannot catch this: it triggers on
    * partition BYTES (256 MB default) while a few thousand rows of
    * quadratic dot products are compute-minutes at single-digit MB. */
  val SelfJoinCap = 2048

  /** Skew-safe within-bucket SELF-join over a SYMMETRIC frame
    * (columns: `keys` ++ `payload`; every row is both probe and
    * candidate) — the shared pair generator behind the blocked
    * dedup/LSH families. One explicit exchange by the bucket key(s);
    * the per-bucket population that drives skew routing is a WINDOW
    * over that exchange (no second shuffle, no separate aggregate
    * subtree — and because the frame is symmetric, both join sides
    * consume identical columns, so their exchange subtrees
    * canonicalize equal and the bucketing projection materializes
    * ONCE, served to every consumer as a runtime ReusedExchange;
    * plan-audited).
    *
    * Hot/cold routing: buckets at/under `cap` join shuffle-free on
    * the shared exchange; an over-cap bucket hashes its candidate
    * side into ceil(pop/cap) parts by `payload.head` and replicates
    * its probe side per part (`explode(sequence)`), so each
    * (probe, candidate) pair is produced exactly once — in the
    * candidate's part — and the hot bucket's O(p²) pair work lands
    * on parallel tasks instead of one serialized straggler. The
    * shuffle cost is proportional to the skew, not the corpus, and
    * with no hot buckets AQE's empty-relation propagation deletes
    * the hot branch at runtime.
    *
    * Emits every ordered in-bucket pair exactly once — including
    * self-pairs — with probe-side columns `<payload>_a` and
    * candidate-side `<payload>_b`, plus the key columns; callers
    * impose `a < b` (unordered) or `a =!= b` (ordered).
    * Bit-identical to the naive bucket self-join (partitioning only;
    * differential-tested with a forced tiny cap). */
  def selfPairsByBucket(frame: DataFrame, keys: Seq[String],
      payload: Seq[String], cap: Int = SelfJoinCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(payload.nonEmpty, "payload must name at least one column")
    val keyCols = keys.map(col)
    val withS = frame.repartition(keyCols: _*)
      .withColumn("__s", greatest(ceil(
        count(lit(1)).over(Window.partitionBy(keyCols: _*))
          .cast("double") / cap).cast("int"), lit(1)))
    def side(df: DataFrame, suffix: String, part: Option[Column]) =
      df.select((keyCols ++ part.map(_.as("__part")).toSeq ++
        payload.map(c => col(c).as(s"${c}_$suffix"))): _*)

    val cold = withS.filter(col("__s") === 1)
    val coldPairs = side(cold, "a", None).join(side(cold, "b", None), keys)

    val hot = withS.filter(col("__s") > 1)
    val hotPairs = side(
        hot.withColumn("__p", explode(sequence(lit(0), col("__s") - 1))),
        "a", Some(col("__p")))
      .join(side(hot, "b", Some(
          pmod(xxhash64(col(payload.head)), col("__s").cast("long"))
            .cast("int"))),
        keys :+ "__part")
      .drop("__part")

    coldPairs.unionByName(hotPairs)
  }

  /** Two-phase salted aggregation: groupBy (keys + salt) for the heavy
    * partial, then re-aggregate by keys. `aggs` must be decomposable
    * (sum/count/min/max — the reference only uses these, SURVEY §2.5).
    *
    * Example: saltedAgg(df, Seq("k"), col("id"), 16)(
    *   "cnt" -> (count(lit(1)), sum(_)), "mx" -> (max(col("v")), max(_))) */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltSource: Column,
      saltBuckets: Int)(
      aggs: (String, (Column, Column => Column))*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, (p, _)) => p.as(s"__p_$n") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, (_, f)) => f(col(s"__p_$n")).as(n) }: _*)
  }

  /** Salted equi-join for a skewed probe side: the probe rows get a
    * deterministic salt in [0, buckets); the build side is replicated
    * once per salt value. Join key becomes (key, salt). Use when ONE
    * side is small enough to replicate but too big (or too skewed) to
    * broadcast outright. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltSource: Column, buckets: Int, joinType: String = "inner"): DataFrame = {
    val p = probe.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
    val b = build
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
      .withColumnRenamed(key, s"__b_$key")
    p.join(b, p("__salt") === b("__salt") && p(key) === col(s"__b_$key"), joinType)
      .drop("__salt", s"__b_$key")
  }
}
