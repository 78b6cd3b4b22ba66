package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the BPE-apply contract of [[PipelineQueries.bpePieces]]: the
  * pinned merge table applies in rank order, each rank replacing
  * left-to-right without overlap — the exact scheme the DuckDB oracle
  * replays (value parity is the driver's gate; these are the semantic
  * edge cases). */
class BpeSpec extends SparkSpec {

  private def apply(tokens: String*): Map[String, Seq[String]] = {
    import spark.implicits._
    tokens.toDF("tok")
      .select(col("tok"), PipelineQueries.bpePieces(col("tok")).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
  }

  test("multi-level merges collapse corpus words to single pieces") {
    val r = apply("table", "value", "scan", "fast", "key", "row", "agg")
    assert(r("table") == Seq("table"))
    assert(r("value") == Seq("value"))
    assert(r("scan") == Seq("scan"))
    assert(r("fast") == Seq("fast"))
    assert(r("key") == Seq("key"))
    assert(r("row") == Seq("row"))
    assert(r("agg") == Seq("agg")) // needs the overlap-then-stack path
  }

  test("partial merges leave unmerged symbols as singles") {
    val r = apply("data", "stream", "sort")
    assert(r("data") == Seq("d", "a", "ta"))   // only (t,a) applies
    assert(r("stream") == Seq("st", "r", "e", "a", "m"))
    assert(r("sort") == Seq("s", "o", "r", "t")) // no merge matches
  }

  test("within a rank, replacement is left-to-right non-overlapping") {
    val r = apply("agag", "aggg", "tata")
    // (a,g) hits positions 0 and 2 — NOT the overlapping middle pair.
    assert(r("agag") == Seq("ag", "ag"))
    // [a,g,g,g]: rank16 merges the first pair only -> [ag,g,g]; then
    // rank17 (ag,g) -> [agg, g].
    assert(r("aggg") == Seq("agg", "g"))
    assert(r("tata") == Seq("ta", "ta"))
  }

  test("registered query emits one row per doc with consistent counts") {
    val df = PipelineQueries.bpeTokenize(spark, "/root/testdata/sf0.001").cache()
    try {
      val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").count()
      assert(df.count() == docs)
      // n_pieces >= n_tokens (a token yields at least one piece), and
      // the csv has exactly n_pieces ids.
      assert(df.filter(col("n_pieces") < col("n_tokens")).count() == 0)
      assert(df.filter(size(split(col("ids_csv"), ",")) =!= col("n_pieces"))
        .count() == 0)
    } finally { df.unpersist(); () }
  }
}
