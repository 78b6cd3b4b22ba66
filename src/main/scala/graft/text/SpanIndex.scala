package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{TextFunctions => TF}

/** Incrementally-maintainable cross-document gram index — the state
  * behind exact substring-span dedup (Lee et al.'s practical form;
  * see `TextQueries.spanDedup`), lifted across load cycles the same
  * way [[graft.etl.IncrementalAgg]] lifts grouped aggregates: store a
  * per-gram summary with each cycle, absorb tomorrow's delta by
  * MERGING summaries, and never re-scan accumulated history to learn
  * which grams repeat.
  *
  * The summary per gram hash is (nd, doc0):
  *  - `nd` — how many distinct documents contain the gram. Batches are
  *    DOC-ATOMIC (a document arrives wholly in one load cycle — the
  *    reference's load model and every training-corpus snapshot
  *    model), so distinct-doc counts across batches add: merge is
  *    sum(nd), the same algebra as a countMetric.
  *  - `doc0` — the minimum containing doc id, merged by min. Its job:
  *    when a delta turns a previously-unique gram into a duplicate
  *    (hist nd == 1), doc0 IS that single history document — the one
  *    whose spans must be re-marked. That makes the affected-doc set
  *    computable from the index alone, without a gram→doc posting
  *    list.
  *
  * At 100 TB: indexing a delta is |delta| work; the merge is one
  * union + one |index|-sized aggregate (and the index can itself live
  * partitioned/bucketed by gh); re-marking touches only
  * delta docs ∪ [[affectedHistoryDocs]] — never the corpus. The
  * merge-equals-recompute guarantee is machine-checked by the
  * `span_dedup_incr` registry row (hash-equal to `span_dedup`'s full
  * recompute) and the affected-doc refinement by `SpanIndexSpec`.
  */
object SpanIndex {

  /** The k-gram stream of a document batch: (doc_id, pos, gh), pos
    * 1-based. One projection — no shuffle. */
  def grams(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
        posexplode(TF.wordNgrams(TF.tokens(col("text")), k))
          .as(Seq("pos0", "g")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        TF.portableHash(col("g"), "span").as("gh"))

  /** Per-batch index summary: (gh, nd, doc0). One gram-keyed
    * aggregate over the batch's gram stream. */
  def summarize(grams: DataFrame): DataFrame =
    grams.groupBy(col("gh"))
      .agg(count_distinct(col("doc_id")).as("nd"),
        min(col("doc_id")).as("doc0"))

  /** Merge index summaries from disjoint (doc-atomic) batches: one
    * union + one |index| aggregate; bit-equal to summarizing the
    * concatenated gram streams. */
  def merge(indexes: Seq[DataFrame]): DataFrame = {
    require(indexes.nonEmpty, "at least one index required")
    indexes.reduce(_.unionByName(_))
      .groupBy(col("gh"))
      .agg(sum(col("nd")).as("nd"), min(col("doc0")).as("doc0"))
  }

  /** The cross-document duplicated grams of an index. */
  def dupGrams(index: DataFrame): DataFrame =
    index.filter(col("nd") >= 2).select(col("gh"))

  /** History documents whose spans change when `deltaIndex` lands:
    * exactly the doc0 of history grams that were UNIQUE (nd == 1) and
    * gained an occurrence in the delta. Grams already duplicated in
    * history stay duplicated (their spans were marked in an earlier
    * cycle); grams absent from history affect only delta docs, which
    * a cycle re-marks anyway. |affected| is bounded by the number of
    * newly-crossing grams — |delta|-scaled, never corpus-scaled. */
  def affectedHistoryDocs(histIndex: DataFrame,
      deltaIndex: DataFrame): DataFrame =
    histIndex.filter(col("nd") === 1)
      .join(deltaIndex.select(col("gh")), Seq("gh"))
      .select(col("doc0").as("doc_id")).distinct()

  /** Maximal repeated spans for the documents in `grams`, given the
    * duplicated-gram set: join-back mark, then per-doc
    * gaps-and-islands (equal gram length makes start positions
    * sufficient: a next start within k of the previous overlaps or
    * touches). Output: (doc_id, span_start, span_end, span_tokens),
    * 1-based inclusive token indices. */
  def spans(grams: DataFrame, dupGh: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val marked = grams.join(dupGh, Seq("gh"))
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) > k, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }
}
