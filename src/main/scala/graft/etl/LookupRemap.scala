package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lookup-dimension vocabulary remapping — SURVEY §2.4 J1/J2.
  *
  * The reference left-joins each fact against 1-5 two-column
  * `lkp_*(source_name, target_name)` dimensions and overwrites the fact
  * column only when the lookup hit:
  * `when(lkp.target.isNotNull, lkp.target).otherwise(src)`
  * (`Load CT Patients Job/.../LoadCTPatients.java:144-157`). The same
  * dimension may be joined several times under different aliases — e.g.
  * the regimen lookup 3x for Previous/Start/Last regimen
  * (`Load CT ART Patients/.../LoadARTPatients.java:88-90,141-144`).
  *
  * Scale: lookup dims are tiny (tens-hundreds of rows) next to 100 TB
  * facts, so every remap join is explicitly `broadcast()` — zero
  * shuffle of the fact side, and N remaps stay inside one stage.
  */
object LookupRemap {

  /** Left-join `lkp(srcName, tgtName)` onto `df(column)` and overwrite
    * `column` with the lookup target where matched. The lookup is
    * deduped on its source key first: duplicate `source_name` rows in a
    * lookup dim would otherwise fan out the fact table (FIXTURES §A2
    * hazard — the reference is silently exposed to this; we are not). */
  def remap(df: DataFrame, lkp: DataFrame, column: String,
      srcName: String = "source_name",
      tgtName: String = "target_name"): DataFrame = {
    val tag = s"__lkp_$column"
    val dim = broadcast(
      lkp.select(col(srcName).as(s"${tag}_src"), col(tgtName).as(s"${tag}_tgt"))
        .dropDuplicates(s"${tag}_src"))
    df.join(dim, col(column) === col(s"${tag}_src"), "left")
      .withColumn(column,
        when(col(s"${tag}_tgt").isNotNull, col(s"${tag}_tgt"))
          .otherwise(col(column)))
      .drop(s"${tag}_src", s"${tag}_tgt")
  }

  /** J2 — the same lookup applied to several columns (self-alias
    * multi-join in the reference; here just a fold of broadcast joins). */
  def remapAll(df: DataFrame, lkp: DataFrame, columns: Seq[String],
      srcName: String = "source_name",
      tgtName: String = "target_name"): DataFrame =
    columns.foldLeft(df)((d, c) => remap(d, lkp, c, srcName, tgtName))
}
