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

  test("bpeLearn reproduces the hand-computed merge sequence on a known corpus") {
    import spark.implicits._
    // Corpus: low x3, lower x1, lowest x1. Hand-run of Sennrich BPE
    // with the (cnt desc, lhs asc, rhs asc) tie-break:
    //   r1 (l,o)=5 ties (o,w)=5 -> lex picks (l,o)
    //   r2 (lo,w)=5   r3 (low,e)=2
    //   r4 count-1 three-way tie (lowe,r)/(lowe,s)/(s,t) -> (lowe,r)
    //   r5 (lowe,s) beats (s,t)   r6 (lowes,t)   then exhausted -> 6
    //   rows despite the 8-round cap.
    val dir = java.nio.file.Files.createTempDirectory("graft-bpelearn").toString
    Seq((0L, "low low lower"), (1L, "low lowest"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.bpeLearn(spark, dir)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "l", "o", 5L),
      (2L, "lo", "w", 5L),
      (3L, "low", "e", 2L),
      (4L, "lowe", "r", 1L),
      (5L, "lowe", "s", 1L),
      (6L, "lowes", "t", 1L)))
  }
}
