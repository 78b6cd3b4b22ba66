package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.SparkSpec

class SchemaDriftSpec extends SparkSpec {

  import spark.implicits._

  private def expected = Seq((1L, "a", 10L), (2L, "b", 20L))
    .toDF("k", "name", "v")

  test("drifts detects added, missing, and retyped columns (case-insensitively)") {
    val drifted = Seq(("1", "a", "x"), ("zz", "b", "y"))
      .toDF("K", "name", "extra") // K retyped to string, v missing, extra added
    val ds = SchemaDrift.drifts(expected.schema, drifted.schema)
    // Retyped columns report under the EXPECTED side's name (the
    // target schema is the naming authority).
    assert(ds.map(d => (d.column, d.kind)) ==
      Seq(("extra", "added"), ("k", "retyped"), ("v", "missing")))
    assert(ds.find(_.kind == "retyped").get.expectedType == "bigint")
    assert(ds.find(_.kind == "retyped").get.actualType == "string")
  }

  test("identical schemas produce an empty report") {
    assert(SchemaDrift.drifts(expected.schema, expected.schema).isEmpty)
    assert(SchemaDrift.reportDf(spark, expected.schema, expected.schema)
      .count() == 0)
  }

  test("conform fills missing with typed NULL, drops extras, try_casts retypes") {
    val drifted = Seq(("1", "a", "x"), ("oops", "b", "y"))
      .toDF("k", "name", "extra")
    val c = SchemaDrift.conform(drifted, expected.schema)
    assert(c.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("k", LongType), ("name", StringType), ("v", LongType)))
    val rows = c.orderBy(col("name")).collect()
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(2))
    // "oops" does not parse as bigint: try_cast nulls it instead of
    // throwing (the ANSI-safe reference semantics).
    assert(rows(1).isNullAt(0))
  }

  test("unionConformed absorbs a drifted second batch") {
    val drifted = Seq(("3", "c", "x")).toDF("k", "name", "extra")
    val u = SchemaDrift.unionConformed(expected, drifted)
    assert(u.count() == 3)
    assert(u.filter(col("k") === 3L && col("v").isNull).count() == 1)
  }

  test("conform is a no-op projection on a matching batch (no shuffle)") {
    val plan = SchemaDrift.conform(expected, expected.schema)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"conform must not shuffle:\n$plan")
  }
}
