package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII hashing: `UPPER(SHA2(value, 256))` over the string form of a key.
  *
  * The reference does this two ways: in-engine on the DataFrame
  * (`Load CT ART Patients/src/main/java/org/kenyahmis/loadctpatients/
  * LoadARTPatients.java:180-181`) and as a post-write T-SQL
  * `UPDATE ... hashbytes('SHA2_256', ...)` side channel
  * (`Core/src/main/java/org.kenyahmis.core/DatabaseUtils.java:54-69`).
  * This engine always computes the hash at transform time — no in-place
  * mutation of the sink, so the write stays append-only and idempotent.
  *
  * `sha2` is a codegen'd built-in: stays inside WholeStageCodegen, no
  * UDF boundary, fully distributed.
  */
object PiiHash {

  def sha256Upper(c: Column): Column = upper(sha2(c.cast("string"), 256))

  /** Add `<col>Hash` columns for each named PII column. */
  def hashColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(s"${c}Hash", sha256Upper(col(c))))

  /** Replace PII columns with their hashes in place (same column name). */
  def maskColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, sha256Upper(col(c))))
}
