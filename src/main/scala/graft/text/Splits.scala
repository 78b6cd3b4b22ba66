package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test assignment — the last step of a
  * training-data pipeline, with the property that makes or breaks it
  * at evaluation time: NO LEAKAGE ACROSS SPLITS. A random split leaks
  * whenever two near-duplicate documents land on different sides;
  * the benchmark then scores memorization as generalization.
  *
  * [[hashSplit]] is the stateless baseline: a portable md5-derived
  * bucket of the id, pure projection, reproducible across runs,
  * engines, and languages (no rand(), no seed plumbing, no
  * partition-order dependence — the same guarantees the stratified
  * sampler pins).
  *
  * [[leakageSafeSplit]] composes with the near-dup pipeline: every
  * document is assigned by the hash of its dup-cluster CANONICAL id
  * (its component label from [[Components.connected]]; singletons are
  * their own canonical), so an entire near-duplicate cluster moves to
  * the same split atomically. Scale shape: the components frame is
  * the dup SUBSET only — tiny next to the corpus — so this is one
  * broadcast-or-shuffle left join plus a projection; nothing new
  * touches the full corpus twice. */
object Splits {

  /** Permille cut points: [0, trainPm) -> train,
    * [trainPm, trainPm + valPm) -> val, rest -> test. */
  private def label(bucket: Column, trainPm: Int, valPm: Int): Column =
    when(bucket < trainPm, lit("train"))
      .when(bucket < trainPm + valPm, lit("val"))
      .otherwise(lit("test"))

  /** Stateless deterministic split on `idCol`'s portable hash. */
  def hashSplit(df: DataFrame, idCol: String, trainPm: Int = 900,
      valPm: Int = 50, salt: String = "split"): DataFrame = {
    require(trainPm >= 0 && valPm >= 0 && trainPm + valPm <= 1000,
      s"permille cuts out of range: train=$trainPm val=$valPm")
    df.withColumn("split",
      label(pmod(TextFunctions.portableHash(col(idCol), salt), lit(1000L)),
        trainPm, valPm))
  }

  /** Split by dup-cluster canonical id: `components` is
    * (idCol, comp) over the near-duplicate SUBSET (from
    * [[Components.connected]]); documents outside any cluster hash
    * their own id. All members of a cluster share a canonical, hence
    * a split — no near-duplicate pair ever straddles a boundary. */
  def leakageSafeSplit(df: DataFrame, idCol: String,
      components: DataFrame, trainPm: Int = 900, valPm: Int = 50,
      salt: String = "split"): DataFrame = {
    require(trainPm >= 0 && valPm >= 0 && trainPm + valPm <= 1000,
      s"permille cuts out of range: train=$trainPm val=$valPm")
    val comps = components
      .select(col(idCol).as("__s_id"), col("comp").as("__s_comp"))
    df.join(comps, col(idCol) === col("__s_id"), "left")
      .withColumn("split",
        label(pmod(TextFunctions.portableHash(
          coalesce(col("__s_comp"), col(idCol)), salt), lit(1000L)),
          trainPm, valPm))
      .drop("__s_id", "__s_comp")
  }
}
