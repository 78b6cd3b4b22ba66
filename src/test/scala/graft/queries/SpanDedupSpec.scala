package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.text.{TextFunctions => TF}

/** Property tests for the exact substring-span dedup: after cutting
  * every reported span, no cross-document repeated k-gram may survive
  * (the Lee-et-al guarantee), and the spans themselves must be
  * well-formed maximal interval unions. */
class SpanDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K = TextQueries.SpanK

  test("no surviving cross-doc k-gram repeat outside reported spans") {
    val spans = TextQueries.spanDedup(spark, dir)
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(TF.wordNgrams(TF.tokens(col("text")), K))
          .as(Seq("pos0", "g")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        TF.portableHash(col("g"), "span").as("gh"))
    // A gram survives iff its token window [pos, pos+K-1] misses every
    // span of its document.
    val covered = grams.join(spans, Seq("doc_id"))
      .filter(col("pos") <= col("span_end") &&
        col("pos") + (K - 1) >= col("span_start"))
      .select(col("doc_id"), col("pos")).distinct()
    val surviving = grams.join(covered, Seq("doc_id", "pos"), "left_anti")
    val repeats = surviving.groupBy(col("gh"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).count()
    assert(repeats == 0L, s"$repeats cross-doc k-grams survived span removal")
  }

  test("cut corpus: no cross-doc repeated k-gram remains; span-free docs pass verbatim") {
    val cut = TextQueries.spanDedupCut(spark, dir).cache()
    try {
      // Directly on the cleaned text: zero k-grams shared by >= 2 docs.
      val grams = cut.select(col("doc_id"),
          explode(TF.wordNgrams(TF.tokens(col("cleaned_text")), K)).as("g"))
        .groupBy(col("g"))
        .agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).count()
      assert(grams == 0L, s"$grams cross-doc k-grams survive in the cut corpus")
      // Docs with no spans keep their exact text.
      val spans = TextQueries.spanDedup(spark, dir)
      val untouched = Tables.documents(spark, dir)
        .join(spans.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      val drift = untouched.join(cut, Seq("doc_id"))
        .filter(col("text") =!= col("cleaned_text")).count()
      assert(drift == 0L, s"$drift span-free docs were altered")
    } finally { cut.unpersist(); () }
  }

  test("spans are well-formed, at least K tokens, and non-overlapping per doc") {
    val spans = TextQueries.spanDedup(spark, dir).cache()
    try {
      assert(spans.count() > 0, "fixture corpus contains duplicated passages")
      assert(spans.filter(col("span_tokens") < K ||
        col("span_tokens") =!= col("span_end") - col("span_start") + 1)
        .count() == 0)
      // Maximality: consecutive spans of a doc must be separated by at
      // least one uncovered token (else they would be one island).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("span_start"))
      val overlapping = spans
        .withColumn("prev_end", lag(col("span_end"), 1).over(w))
        .filter(col("prev_end").isNotNull &&
          col("span_start") <= col("prev_end") + 1)
        .count()
      assert(overlapping == 0L, s"$overlapping adjacent/overlapping spans")
    } finally { spans.unpersist(); () }
  }
}
