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

  test("cast-incompatible retype conforms to typed NULLs instead of throwing") {
    // date -> boolean has no cast at all (even try_cast is an
    // analysis error); conform must treat the values as
    // unrepresentable, not crash the load.
    val drifted = Seq(("2024-01-01", 1L)).toDF("flag", "k")
      .withColumn("flag", col("flag").cast("date"))
    val expected = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", LongType),
      org.apache.spark.sql.types.StructField("flag",
        org.apache.spark.sql.types.BooleanType)))
    val out = SchemaDrift.conform(drifted, expected)
    val row = out.collect().head
    assert(row.getLong(0) == 1L && row.isNullAt(1))
    // The report still calls it a retype with both type names.
    val d = SchemaDrift.drifts(expected, drifted.schema)
    assert(d == Seq(SchemaDrift.ColumnDrift("flag", "retyped", "boolean", "date")))
  }

  test("generative: conform always lands exactly on the expected schema, idempotently") {
    // Fixed-seed random drift pairs (house style — no scalacheck
    // bridge offline): expected = random subset/order of a column
    // pool; actual = independent random subset/order with random
    // retypes. Invariant: conform's output schema equals expected in
    // names, order, and types on EVERY pair, and a second conform is
    // a fixed point.
    val rnd = new scala.util.Random(42)
    val pool = Seq("k" -> "bigint", "name" -> "string", "v" -> "bigint",
      "w" -> "double", "d" -> "date", "f" -> "boolean")
    val types = Seq("bigint", "string", "double", "date", "boolean")
    import org.apache.spark.sql.functions._
    val base = spark.range(3).toDF("id")
    for (_ <- 1 to 30) {
      val exp = rnd.shuffle(pool).take(1 + rnd.nextInt(pool.size))
      val act = rnd.shuffle(pool).take(1 + rnd.nextInt(pool.size))
        .map { case (n, t) =>
          n -> (if (rnd.nextBoolean()) t else types(rnd.nextInt(types.size)))
        }
      val expected = org.apache.spark.sql.types.StructType(exp.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(t))
      })
      val actualDf = base.select(act.map { case (n, t) =>
        lit(null).cast(t).as(n) }: _*)
      val out = SchemaDrift.conform(actualDf, expected)
      assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        expected.fields.map(f => (f.name, f.dataType)).toSeq,
        s"exp=$exp act=$act got=${out.schema.simpleString}")
      val again = SchemaDrift.conform(out, expected)
      assert(again.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        out.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    }
  }

  test("conform is a no-op projection on a matching batch (no shuffle)") {
    val plan = SchemaDrift.conform(expected, expected.schema)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"conform must not shuffle:\n$plan")
  }
}
