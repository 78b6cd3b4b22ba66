package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity suppression — the governance gate a patient-level
  * warehouse (the reference's domain: line-listed HIV care data,
  * `Load CT Patients Job`) applies before any export: rows whose
  * quasi-identifier combination matches fewer than k records have
  * those identifiers suppressed, so no released row is isolatable
  * below the k threshold.
  *
  * Set-based: one groupBy over the quasi columns for the group sizes
  * (map-side combined), one null-safe join back (`<=>`, so NULL
  * quasi values form their own group instead of silently never
  * matching), one projection that masks. The group-size frame is
  * |distinct quasi combinations|-sized — usually broadcastable; at a
  * pathological cardinality the join degrades to a linear keyed
  * shuffle, never worse.
  */
object Privacy {

  /** Suppress `quasi` columns (rendered as strings) to `mask` on
    * every row whose quasi-group has fewer than `k` members; adds a
    * BIGINT `suppressed` flag. Non-quasi columns pass through
    * untouched. */
  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Int,
      mask: String = "*"): DataFrame = {
    require(quasi.nonEmpty, "kAnonymize needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    val tag = "__ka_"
    val counts = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as(s"${tag}n"))
      .select(quasi.map(c => col(c).as(s"$tag$c")) :+ col(s"${tag}n"): _*)
    val cond: Column = quasi.map(c => df(c) <=> counts(s"$tag$c")).reduce(_ && _)
    val small = counts(s"${tag}n") < k
    val masked = df.columns.toSeq.map { c =>
      if (quasi.contains(c))
        when(small, lit(mask)).otherwise(df(c).cast("string")).as(c)
      else df(c)
    }
    df.join(broadcast(counts), cond)
      .select(masked :+ when(small, 1L).otherwise(0L).as("suppressed"): _*)
  }

  /** l-diversity suppression (Machanavajjhala et al. 2007) — the
    * stronger gate k-anonymity needs when a quasi-group, though
    * large, is HOMOGENEOUS in the sensitive attribute (everyone in
    * the group shares the diagnosis: group size protects nothing).
    * Rows whose quasi-group carries fewer than `l` distinct values
    * of `sensitive` get their quasi-identifiers masked.
    *
    * Same exchange budget as [[kAnonymize]]: one distinct-count
    * aggregate over the quasi columns (map-side partial), one
    * broadcast join back, one masking projection. */
  def lDiversify(df: DataFrame, quasi: Seq[String], sensitive: Column,
      l: Int, mask: String = "*"): DataFrame = {
    require(quasi.nonEmpty, "lDiversify needs at least one quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    val tag = "__ld_"
    val counts = df.withColumn(s"${tag}s", sensitive)
      .groupBy(quasi.map(col): _*)
      .agg(count_distinct(col(s"${tag}s")).as(s"${tag}d"))
      .select(quasi.map(c => col(c).as(s"$tag$c")) :+ col(s"${tag}d"): _*)
    val cond: Column = quasi.map(c => df(c) <=> counts(s"$tag$c")).reduce(_ && _)
    val homogeneous = counts(s"${tag}d") < l
    val masked = df.columns.toSeq.map { c =>
      if (quasi.contains(c))
        when(homogeneous, lit(mask)).otherwise(df(c).cast("string")).as(c)
      else df(c)
    }
    df.join(broadcast(counts), cond)
      .select(masked :+ when(homogeneous, 1L).otherwise(0L).as("suppressed"): _*)
  }
}
