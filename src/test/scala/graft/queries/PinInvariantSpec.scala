package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The exchange-reuse pin filters in the curation family
  * (`CurationQueries.lineDedup`'s shared-frame pin, `lmFilter`'s
  * w1/w2 null pre-filter, `bm25Rank`'s doc_id pre-filter) are
  * documented as "true by construction but unprovable to Catalyst" —
  * they must be VALUE-NEUTRAL or the reuse trick silently changes
  * results. This spec makes the construction claims evidence instead
  * of comment:
  *
  *  - the fixture corpus satisfies the table contract the pins assume
  *    (doc_id non-null);
  *  - [[CurationQueries.lines]] GUARANTEES pos >= 1 (1-based
  *    sequence), pos < 100000 (the okey packing bound), and non-null
  *    doc_id / line_raw / tokens on ANY corpus honoring that
  *    contract — exercised on a fixed-seed adversarial generator
  *    (empty/whitespace-only/unicode/huge/newline-heavy texts);
  *  - therefore each pin filter leaves row counts unchanged, asserted
  *    directly on both the fixtures and the generated corpus.
  */
class PinInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.Tables.documents(spark, dir)

  /** Fixed-seed adversarial corpus (house style — reproducible, no
    * scalacheck bridge): token shapes chosen to stress the line
    * decomposition — empty text, whitespace-only, single token,
    * exact LineLen multiples, off-by-one around the window, unicode,
    * long repeated runs, leading/trailing/multiple separators. */
  private def generatedDocs = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val words = Vector("alpha", "βήτα", "x", "the", "of", "naïve",
      "tok99", "☃", "a-b_c", "MiXeD")
    val seps = Vector(" ", "  ", "\t", "\n", " \n ", "\r\n")
    def randomText(): String = {
      val n = rnd.nextInt(40)
      (0 until n).map(_ => words(rnd.nextInt(words.length)))
        .mkString(seps(rnd.nextInt(seps.length)))
    }
    val edge = Seq(
      "", " ", "   ", "\n\n", "\t",
      "solo",
      (1 to 8).map(i => s"w$i").mkString(" "),   // exactly one window
      (1 to 9).map(i => s"w$i").mkString(" "),   // one token past it
      (1 to 7).map(i => s"w$i").mkString(" "),   // one token short
      " lead", "trail ", " both ",
      ("rep " * 500).trim)                        // many windows
    val texts = edge ++ (1 to 200).map(_ => randomText())
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("fixtures satisfy the table contract the pins assume") {
    assert(docs.filter(col("doc_id").isNull).count() == 0,
      "documents fixture carries a null doc_id — bm25/lineDedup pins " +
        "would become value-changing")
    assert(docs.filter(col("text").isNull).count() == 0)
  }

  test("lines() invariants hold on the fixtures") {
    val ls = CurationQueries.lines(docs).cache()
    try {
      assert(ls.filter(col("doc_id").isNull).count() == 0)
      assert(ls.filter(col("pos") < 1).count() == 0, "pos is 1-based")
      assert(ls.filter(col("pos") >= 100000L).count() == 0,
        "okey packing (doc_id * 100000 + pos) requires pos < 100000")
      assert(ls.filter(col("line_raw").isNull).count() == 0)
    } finally ls.unpersist()
  }

  test("lines() invariants hold on the adversarial generated corpus") {
    val ls = CurationQueries.lines(generatedDocs).cache()
    try {
      assert(ls.filter(col("doc_id").isNull || col("line_raw").isNull ||
        col("pos") < 1 || col("pos") >= 100000L).count() == 0)
      // Window arithmetic stays exact on the edge shapes: positions
      // per doc are dense 1..ceil(n_tokens/8) (no gaps, no repeats).
      val perDoc = ls.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n"), min(col("pos")).as("lo"),
        max(col("pos")).as("hi"), count_distinct(col("pos")).as("d"))
      assert(perDoc.filter(col("lo") =!= 1L || col("hi") =!= col("n") ||
        col("d") =!= col("n")).count() == 0,
        "line positions must be dense and 1-based per document")
    } finally ls.unpersist()
  }

  test("pin filters are value-neutral: row counts unchanged") {
    // lineDedup's shared-frame pin, verbatim predicate.
    for (src <- Seq(docs, generatedDocs)) {
      val ls = CurationQueries.lines(src).cache()
      try {
        val pinned = ls.filter(col("doc_id").isNotNull &&
          col("pos") >= 1 && length(col("line_raw")) >= 0)
        assert(pinned.count() == ls.count(),
          "lineDedup pin filter dropped rows — reuse pin is not free")
      } finally ls.unpersist()
    }
    // lmFilter's w1/w2 pre-filter: bigram tokens are never null.
    val toks = docs.select(col("doc_id"),
      graft.text.TextFunctions.tokens(col("text")).as("t"))
    val bg = toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    assert(bg.filter(col("w1").isNull || col("w2").isNull).count() == 0,
      "bigram stream carries null tokens — lmFilter pin is not free")
    // bm25Rank's doc_id pre-filter on the shared token frame.
    assert(docs.filter(col("doc_id").isNotNull).count() == docs.count())
  }
}
