package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Snapshot reconciliation (`etl/Diff.tableDiff`): class coverage,
  * null-key presence, null-safe change detection. */
class DiffSpec extends SparkSpec {

  private def df(rows: Seq[(java.lang.Long, String, String)]) = {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))), schema)
  }

  private def classify(oldRows: Seq[(java.lang.Long, String, String)],
      newRows: Seq[(java.lang.Long, String, String)]): Map[Option[Long], String] =
    Diff.tableDiff(df(oldRows), df(newRows), Seq("k"), Seq("a", "b"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1))).toMap

  test("a key column repeated in compareCols is deduped, not ambiguous") {
    // Pre-fix this projected duplicate __o_k/__n_k columns and the
    // join failed with an ambiguous-reference AnalysisException.
    val got = Diff.tableDiff(
        df(Seq((1L, "x", "p"), (2L, "y", "q"))),
        df(Seq((1L, "x", "p"), (2L, "y", "Q"))),
        Seq("k"), Seq("k", "a", "b"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "same", 2L -> "changed"))
  }

  test("all four change classes in one pass") {
    val got = classify(
      oldRows = Seq((1L, "x", "p"), (2L, "y", "q"), (3L, "z", "r")),
      newRows = Seq((1L, "x", "p"), (2L, "y", "CHANGED"), (4L, "w", "s")))
    assert(got == Map(
      Some(1L) -> "same", Some(2L) -> "changed",
      Some(3L) -> "removed", Some(4L) -> "added"))
  }

  test("a row with an all-NULL key is still PRESENT (marker, not key probe)") {
    val got = classify(
      oldRows = Seq((null, "x", "p")),
      newRows = Seq((null, "x", "p")))
    assert(got == Map(None -> "same"))
  }

  test("null-safe compare: null->null is same, null->value is changed") {
    val got = classify(
      oldRows = Seq((1L, null, "p"), (2L, null, "q")),
      newRows = Seq((1L, null, "p"), (2L, "now-set", "q")))
    assert(got(Some(1L)) == "same" && got(Some(2L)) == "changed")
  }

  test("empty compare set degrades to pure membership (added/removed/same)") {
    val d = Diff.tableDiff(
      df(Seq((1L, "x", "p"), (2L, "y", "q"))),
      df(Seq((2L, "DIFFERENT", "VALUES"), (3L, "z", "r"))),
      Seq("k"), Seq.empty)
    val got = d.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "removed", 2L -> "same", 3L -> "added"))
  }
}
