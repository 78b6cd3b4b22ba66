package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-drift-tolerant ingestion.
  *
  * The reference reads every source through JDBC schema-on-read and
  * enforces the target's column set only via a final explicit
  * projection (SURVEY §1.1, `LoadCTPatients.java:194-202`) — so a
  * source that grows, drops, or retypes a column is silently absorbed
  * until the projection fails. A parquet-based engine has to do the
  * absorbing itself: appending a drifted batch verbatim would create a
  * mixed-schema table (silent corruption on later reads).
  *
  * [[conform]] aligns a drifted batch to an expected schema — missing
  * columns become typed NULLs, extra columns are dropped, retyped
  * columns go through `try_cast` (garbage → NULL under BOTH ANSI
  * modes) — and [[drifts]] / [[reportDf]] make the drift visible
  * instead of silent. Composed into [[graft.jobs.Job.load]] so the
  * incremental append can never fork the target's schema.
  *
  * Scale: all schema logic is driver-side metadata (column lists);
  * the data-path cost of [[conform]] is a single projection — no
  * shuffle, no extra scan, codegen-friendly.
  */
object SchemaDrift {

  /** One detected drift. `kind` ∈ added | missing | retyped;
    * `expectedType`/`actualType` are Spark simple type names, with
    * "absent" standing in on the side the column does not exist. */
  final case class ColumnDrift(
      column: String, kind: String, expectedType: String, actualType: String)

  /** Detect drift of `actual` relative to `expected`. Name resolution
    * is case-insensitive (Spark's default resolver); output is sorted
    * by column name so reports are deterministic. */
  def drifts(expected: StructType, actual: StructType): Seq[ColumnDrift] = {
    def key(f: StructField) = f.name.toLowerCase(java.util.Locale.ROOT)
    val exp = expected.fields.map(f => key(f) -> f).toMap
    val act = actual.fields.map(f => key(f) -> f).toMap
    val added = (act.keySet -- exp.keySet).toSeq.map { k =>
      ColumnDrift(act(k).name, "added", "absent", act(k).dataType.simpleString)
    }
    val missing = (exp.keySet -- act.keySet).toSeq.map { k =>
      ColumnDrift(exp(k).name, "missing", exp(k).dataType.simpleString, "absent")
    }
    val retyped = (exp.keySet & act.keySet).toSeq
      .filter(k => exp(k).dataType != act(k).dataType)
      .map(k => ColumnDrift(exp(k).name, "retyped",
        exp(k).dataType.simpleString, act(k).dataType.simpleString))
    (added ++ missing ++ retyped).sortBy(d => (d.column, d.kind))
  }

  /** [[drifts]] as a 4-column VARCHAR frame
    * (column, kind, expected_type, actual_type) — the drift-report
    * surface a load job emits next to its appended count. */
  def reportDf(spark: SparkSession, expected: StructType,
      actual: StructType): DataFrame = {
    val rows = drifts(expected, actual)
      .map(d => Row(d.column, d.kind, d.expectedType, d.actualType))
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("expected_type", StringType, nullable = false),
      StructField("actual_type", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Align `df` to `expected`: missing → typed NULL, extra → dropped,
    * retyped → `try_cast` to the expected type, output column order =
    * `expected`'s. The result's schema equals `expected` (modulo
    * nullability, which widens to nullable for filled/cast columns) on
    * EVERY input, so downstream unions and appends cannot fork. */
  def conform(df: DataFrame, expected: StructType): DataFrame = {
    val actual = df.schema.fields
      .map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f).toMap
    val cols = expected.fields.map { f =>
      actual.get(f.name.toLowerCase(java.util.Locale.ROOT)) match {
        case None => lit(null).cast(f.dataType).as(f.name)
        case Some(a) if a.dataType == f.dataType => col(a.name).as(f.name)
        case Some(a)
            if org.apache.spark.sql.catalyst.expressions.Cast
              .canTryCast(a.dataType, f.dataType) =>
          // try_cast, not cast: a retyped-to-varchar source column may
          // carry values that no longer parse; reference semantics turn
          // those into NULL, and ANSI mode must not turn them into a
          // job abort.
          col(a.name).try_cast(f.dataType).as(f.name)
        case Some(_) =>
          // Cast-INCOMPATIBLE retype (e.g. date -> boolean): even
          // try_cast is an analysis-time error for such pairs, so the
          // values are unrepresentable in the expected type — treat
          // like a missing column (typed NULLs); the drift report
          // still says "retyped" with both type names. Found by the
          // generative schema property test.
          lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Drift-tolerant N-batch union: every batch is conformed to the
    * FIRST batch's schema, then unioned by position (safe — conform
    * fixed both order and types). `unionByName(allowMissingColumns)`
    * covers only the added/missing axis; this also absorbs retypes. */
  def unionConformed(first: DataFrame, rest: DataFrame*): DataFrame =
    rest.foldLeft(first)((acc, b) => acc.union(conform(b, first.schema)))
}
