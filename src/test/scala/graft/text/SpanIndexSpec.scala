package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[SpanIndex]]'s incremental contract: summaries merge to the
  * recompute index, affected-doc targeting is exact, and the
  * |delta|-sized re-marking path (delta docs ∪ affected history docs,
  * prior spans kept elsewhere) reproduces the full recompute. */
class SpanIndexSpec extends SparkSpec {

  import spark.implicits._

  private val K = 3

  // History: h1 and h2 share a 3-gram run ("a b c d" -> grams abc,
  // bcd both duplicated); h3 holds "p q r s" whose grams are UNIQUE
  // in history. Delta: d1 repeats h3's passage (crossing its grams to
  // duplicated — h3 must be re-marked) and d2/d3 share a delta-only
  // passage.
  private val hist = Seq(
    (1L, "a b c d x y z w"),
    (2L, "a b c d k l m n"),
    (3L, "p q r s t u v w")).toDF("doc_id", "text")
  private val delta = Seq(
    (11L, "p q r s o o o o"),
    (12L, "m m e f g h m m"),
    (13L, "n n e f g h n n")).toDF("doc_id", "text")

  private def spansOf(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_id", "span_start", "span_end", "span_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("merged per-batch summaries equal the recompute index") {
    val full = SpanIndex.summarize(
      SpanIndex.grams(hist.unionByName(delta), K))
    val merged = SpanIndex.merge(Seq(
      SpanIndex.summarize(SpanIndex.grams(hist, K)),
      SpanIndex.summarize(SpanIndex.grams(delta, K))))
    assert(merged.unionByName(full).except(
      merged.intersect(full)).isEmpty, "symmetric difference non-empty")
    assert(merged.count() == full.count())
  }

  test("affectedHistoryDocs names exactly the history docs whose " +
      "unique grams the delta duplicated") {
    val hIdx = SpanIndex.summarize(SpanIndex.grams(hist, K))
    val dIdx = SpanIndex.summarize(SpanIndex.grams(delta, K))
    val affected = SpanIndex.affectedHistoryDocs(hIdx, dIdx)
      .collect().map(_.getLong(0)).toSet
    // Only h3's passage was re-used by the delta; h1/h2's shared grams
    // were ALREADY duplicated (nd == 2) and must not re-mark.
    assert(affected == Set(3L), s"got $affected")
  }

  test("|delta|-sized re-marking equals the full recompute") {
    val all = hist.unionByName(delta)
    val hIdx = SpanIndex.summarize(SpanIndex.grams(hist, K))
    val dIdx = SpanIndex.summarize(SpanIndex.grams(delta, K))
    val merged = SpanIndex.merge(Seq(hIdx, dIdx))
    val dup = SpanIndex.dupGrams(merged)

    // Prior cycle's spans: history marked against the history index.
    val prior = SpanIndex.spans(SpanIndex.grams(hist, K),
      SpanIndex.dupGrams(hIdx), K)

    // This cycle re-marks ONLY delta docs + affected history docs...
    val affected = SpanIndex.affectedHistoryDocs(hIdx, dIdx)
    val remark = delta.unionByName(
      hist.join(affected, Seq("doc_id")).select("doc_id", "text"))
    val remarked = SpanIndex.spans(SpanIndex.grams(remark, K), dup, K)
    // ...and keeps prior spans for every untouched history doc.
    val kept = prior.join(affected, Seq("doc_id"), "left_anti")
    val incremental = spansOf(remarked.unionByName(kept))

    val full = spansOf(SpanIndex.spans(
      SpanIndex.grams(all, K), dup, K))
    assert(incremental == full,
      s"incremental $incremental != full $full")
    // The scenario is non-trivial: h3 gains a span it did not have.
    assert(full.exists(_._1 == 3L) &&
      !spansOf(prior).exists(_._1 == 3L))
  }
}
