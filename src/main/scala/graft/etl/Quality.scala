package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality profiling — the load-gate companion to
  * [[Incremental]]: before (or after) a warehouse load cycle, compute
  * a compact metrics frame answering "did this batch look sane" —
  * row counts, null rates on key columns, domain violations,
  * duplicate keys, out-of-range dates — without N separate jobs.
  *
  * Scale shape: ALL rules evaluate in ONE aggregate pass over the
  * frame (each rule is a conditional-count/min/max expression, all
  * map-side combined); the single metrics row is then unpivoted
  * driver-free into the (metric, value) shape dashboards and
  * assertion gates consume. Exact distinct-count rules plan a
  * multi-distinct Expand (cost x rules); at unbounded scale pass
  * `approxDistinct = true` to swap them for HLL estimates in the
  * same single pass.
  *
  * Reference anchor: the ODS jobs silently trust their extracts
  * (no row-count or null-rate checks anywhere in the 54 jobs); this
  * operator is the guardrail a 100 TB deployment of the same
  * pipeline needs (cited defect catalog:
  * `jobs/ReferenceJobs.scala:96-113`).
  */
object Quality {

  /** One profiling rule: a named BIGINT-valued aggregate, with an
    * optional bounded-memory variant used under `approxDistinct`. */
  final case class Rule(name: String, agg: Column,
      approxAgg: Option[Column] = None)

  /** Count of rows (the batch-size sanity metric). */
  def rowCount(): Rule = Rule("row_count", count(lit(1)))

  /** Empty-batch-safe conditional count: `sum` over zero rows is NULL,
    * and a NULL metric on the day with no delta — the most common
    * anomalous batch — would make every `value == 0` load gate
    * three-valued instead of tripping. */
  private def count0(cond: Column): Column =
    coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))

  /** Count of NULL values in `c` — 0 for a sound key column. */
  def nullCount(c: String): Rule =
    Rule(s"null_$c", count0(col(c).isNull))

  /** Exact distinct count of `c` (HLL estimate under
    * `approxDistinct`). */
  def distinctCount(c: String): Rule =
    Rule(s"distinct_$c", count_distinct(col(c)),
      Some(approx_count_distinct(col(c))))

  /** Count of non-null values of `c` outside the allowed set. */
  def domainViolations(c: String, allowed: Seq[String]): Rule =
    Rule(s"bad_$c",
      count0(col(c).isNotNull && !col(c).isin(allowed: _*)))

  /** Count of non-null `c` values strictly after `maxIso`
    * (future-dated records — E3's detection twin). Only counts values
    * that PARSE as dates — pair with [[unparseableDates]], which
    * catches the format-corrupted ones this rule cannot see (a
    * non-ANSI cast turns garbage into NULL, never into "future"). */
  def futureDates(c: String, maxIso: String): Rule =
    Rule(s"future_$c",
      count0(tryDate(c) > lit(maxIso).cast("date")))

  /** Count of non-null `c` values that fail to parse as dates — the
    * corruption mode [[futureDates]]/[[nullCount]] are both blind to:
    * a batch whose dates drifted to a non-ISO format has zero nulls
    * and zero future dates, yet every value is unusable. */
  def unparseableDates(c: String): Rule =
    Rule(s"unparseable_$c",
      count0(col(c).isNotNull && tryDate(c).isNull))

  /** ANSI-safe string→date coercion: `try_cast` returns NULL for
    * garbage under BOTH ANSI modes, where a plain cast would THROW
    * under `spark.sql.ansi.enabled=true` on exactly the
    * format-corrupted batch these rules exist to classify (and
    * matches the oracle's TRY_CAST). */
  private def tryDate(c: String): Column =
    expr(s"try_cast(`$c` as date)")

  /** Non-null rows minus distinct non-null keys: 0 iff `c` is unique
    * among non-null values (`count_distinct` skips NULLs, so counting
    * all rows would misread every null-key row as a duplicate — null
    * keys are [[nullCount]]'s finding, not this rule's). */
  def duplicateKeys(c: String): Rule =
    Rule(s"dup_$c", count(col(c)) - count_distinct(col(c)),
      // Clamped at 0: HLL can OVERestimate distinct counts, and a
      // negative "duplicate count" would nonsensically trip load
      // gates asserting dup == 0 on a clean batch.
      Some(greatest(lit(0L),
        count(col(c)) - approx_count_distinct(col(c)))))

  /** Evaluate all rules in one aggregate pass; output
    * (metric VARCHAR, value BIGINT), one row per rule, in rule order.
    * `approxDistinct` swaps exact distinct counts for
    * `approx_count_distinct` (avoids the multi-distinct Expand when
    * the frame is unbounded; estimates carry HLL's ~2% error). */
  def profile(df: DataFrame, rules: Seq[Rule],
      approxDistinct: Boolean = false): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    val aggs = rules.map { r =>
      val c = if (approxDistinct) r.approxAgg.getOrElse(r.agg) else r.agg
      c.cast("long").as(r.name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot the single metrics row relationally (no driver collect).
    one.unpivot(Array.empty[Column], rules.map(r => col(r.name)).toArray,
      "metric", "value")
  }
}
