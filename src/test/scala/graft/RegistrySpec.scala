package graft

import org.apache.spark.sql.types.{LongType, StringType}

/** The driver-contract registry, machine-checked.
  *
  * Two silent failure modes of the correctness gate are pinned here:
  * a query registered without an oracle downgrades its check to
  * rows-only (the round-4 `no_oracle` holes), and an output column
  * that is not BIGINT/VARCHAR hashes differently between Spark and
  * DuckDB even when values match (the round-1 DECIMAL/DATE lesson —
  * see the canonicalization rule in `queries/EtlQueries.scala`).
  */
class RegistrySpec extends SparkSpec {

  test("every registered query has a DuckDB oracle, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("every query output column is BIGINT or VARCHAR (canonicalization rule)") {
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, dir).schema.fields.collect {
        case f if f.dataType != LongType && f.dataType != StringType =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty, s"non-canonical output columns:\n${bad.mkString("\n")}")
  }
}
