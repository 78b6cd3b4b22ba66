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
}
