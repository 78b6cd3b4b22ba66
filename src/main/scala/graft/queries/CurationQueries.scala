package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.PageRank
import graft.text.{TextFunctions => TF}

/** Corpus-curation operators from the web-scale training-data
  * playbook: C4-style line-level cleaning (Raffel et al. 2020 §2.2's
  * rules — terminal punctuation, minimum words, badword lines),
  * RefinedWeb/Dolma-style corpus-wide exact line deduplication, a
  * CCNet-style n-gram language-model perplexity filter, and
  * PageRank-based source weighting over an interaction graph
  * ([[graft.graph.PageRank]]).
  *
  * The `documents` corpus has no newlines, so the line decomposition
  * is injected deterministically on BOTH sides (the `pii_redact`
  * convention): lines are consecutive 8-token windows, and a line
  * acquires terminal punctuation iff a portable md5 hash of
  * (doc_id, pos, line) says so — the filter's branches are all real
  * (at sf0.01: 3609 lines, 70% dotted, 22% containing the badword,
  * 175 corpus-duplicate lines) and the DuckDB oracles replay the
  * identical construction.
  */
object CurationQueries {

  private val LineLen = 8

  /** Deterministic line decomposition: (doc_id, pos, line_raw,
    * n_words) — consecutive [[LineLen]]-token windows, 1-based pos.
    * Empty documents produce no lines (guards Spark's descending
    * `sequence(1, 0)` gotcha). */
  private def lines(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("pos",
        explode(expr(s"sequence(1, (size(toks) + ${LineLen - 1}) div $LineLen)")))
      .withColumn("words", expr(s"slice(toks, (pos - 1) * $LineLen + 1, $LineLen)"))
      .select(col("doc_id"), col("pos"),
        array_join(col("words"), " ").as("line_raw"),
        size(col("words")).cast("long").as("n_words"))

  /** DuckDB mirror of [[lines]], ending in
    * `lines(doc_id, pos, line_raw, n_words)`. */
  private val linesCtes =
    s"""toks AS (
      |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
      |), ln0 AS (
      |  SELECT doc_id, unnest(generate_series(1, (len(t)+${LineLen - 1})//$LineLen)) AS pos, t
      |  FROM toks WHERE len(t) > 0
      |), lines AS (
      |  SELECT doc_id, pos,
      |         array_to_string(t[(pos-1)*$LineLen+1 : pos*$LineLen], ' ') AS line_raw,
      |         len(t[(pos-1)*$LineLen+1 : pos*$LineLen]) AS n_words
      |  FROM ln0
      |)""".stripMargin

  /** C4 line-level cleaning: keep a line iff it ends in terminal
    * punctuation AND has >= 5 words AND contains no blocklisted word;
    * keep the document iff >= 3 lines survive. Terminal punctuation is
    * hash-decorated (70% of lines) since the synthetic corpus carries
    * none. Zero-shuffle until the per-doc reassembly groupBy — the
    * single exchange is keyed on doc_id, so the filter is linear and
    * embarrassingly parallel at any corpus size. Output fp is the md5
    * prefix of the surviving text, so the oracle hash proves the
    * KEPT CONTENT matches, not only the counts. */
  def c4LineFilter(spark: SparkSession, dir: String): DataFrame = {
    val ls = lines(Tables.spread(Tables.documents(spark, dir)))
    val dot = TF.portableHash(
      concat_ws(":", col("doc_id"), col("pos"), col("line_raw")), "c4dot") % 10 < 7
    val decorated = ls
      .withColumn("dot", dot)
      .withColumn("line",
        when(col("dot"), concat(col("line_raw"), lit("."))).otherwise(col("line_raw")))
      .withColumn("keep",
        col("dot") && col("n_words") >= 5 && instr(col("line_raw"), "spark") === 0)
    decorated.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        collect_list(when(col("keep"), struct(col("pos"), col("line")))).as("ks"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        when(col("n_kept") >= 3, 1L).otherwise(0L).as("keep_doc"),
        substring(md5(array_join(
          expr("transform(array_sort(ks), x -> x.line)"), "\n")), 1, 16).as("fp"))
  }

  /** Corpus-wide EXACT line deduplication (the RefinedWeb/Dolma pass
    * that precedes fuzzy dedup): every line keeps only its globally
    * first occurrence — min (doc_id, pos) over the whole corpus —
    * and documents are re-emitted with later duplicates removed.
    * Two linear shuffles (groupBy line-hash for the first-occurrence
    * frame, join back on the hash) plus the per-doc reassembly; the
    * first-occurrence frame is |distinct lines|-sized, never held on
    * the driver. The okey packing (doc_id * 100000 + pos) is the
    * portable total order; pos < 100000 is guaranteed by construction
    * (a doc would need 800k tokens to exceed it — n_chars caps far
    * below). */
  def lineDedup(spark: SparkSession, dir: String): DataFrame = {
    val h = lines(Tables.spread(Tables.documents(spark, dir)))
      .withColumn("lh", TF.portableHash(col("line_raw"), "linedup"))
      .withColumn("okey", col("doc_id") * 100000L + col("pos"))
    val firsts = h.groupBy(col("lh")).agg(min(col("okey")).as("first_key"))
    h.join(firsts, "lh")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("okey") === col("first_key"), 1L).otherwise(0L)).as("n_kept"),
        collect_list(when(col("okey") === col("first_key"),
          struct(col("pos"), col("line_raw")))).as("ks"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        substring(md5(array_join(
          expr("transform(array_sort(ks), x -> x.line_raw)"), "\n")), 1, 16).as("fp"))
  }

  /** Keep/drop threshold for the LM filter, in ppm of nats: pinned
    * mid-distribution (sf0.01 avg-NLL spans ~3.25M..3.62M ppm, median
    * ~3.39M) so both verdict branches are real at every sf. */
  private val LmThreshold = 3400000L

  /** CCNet-style n-gram LM perplexity filter: train an add-one-
    * smoothed bigram model on the training slice (doc_id % 5 != 0),
    * score EVERY document by average negative log-likelihood, keep
    * low-perplexity docs. Held-out docs exercise the unseen-bigram
    * smoothing path for real.
    *
    * Determinism: the only floating-point step is the per-DISTINCT-
    * bigram ln(), immediately floored to BIGINT ppm; per-document
    * scores are integer sums of (count * lp_ppm) — order-free, so
    * partitioning cannot perturb the hash (a double sum over a doc's
    * bigrams would be reduction-order-dependent).
    *
    * Scale shape: the model tables are vocabulary-sized (|bigram
    * types| << corpus) and broadcast; the corpus shuffles once, keyed
    * by doc_id, for the score aggregation. At a vocabulary too large
    * to broadcast the joins degrade to ordinary equi-shuffles —
    * still linear. */
  def ngramLmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = Tables.spread(docs)
      .select(col("doc_id"), TF.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val bg = toks.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val train = bg.filter(col("doc_id") % 5 =!= 0)
    val c2 = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    // Vocabulary size is a scalar count action (the tf_idf convention:
    // one value on the driver, not a corpus collect).
    val v: Long = docs.filter(col("doc_id") % 5 =!= 0)
      .select(explode(TF.tokens(col("text"))).as("tok"))
      .agg(count_distinct(col("tok"))).head().getLong(0)
    val perDoc = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    perDoc
      .join(broadcast(c2), Seq("w1", "w2"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .withColumn("lp_ppm",
        floor(log((coalesce(col("c2"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("c1"), lit(0L)) + lit(v))) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("lp_ppm")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(-s) div n_bigrams").as("avg_nll_ppm"))
      .withColumn("keep",
        when(col("avg_nll_ppm") <= LmThreshold, 1L).otherwise(0L))
  }

  /** Source-weighting PageRank over the customer<->supplier
    * interaction graph (distinct trade pairs from orders x lineitem,
    * symmetrized so mass is conserved; customers map to even node
    * ids, suppliers to odd). Three damped rounds of
    * [[PageRank.ranksPpm]] — all-BIGINT, bit-identical to the
    * oracle's unrolled relational replay. */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val e = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2L).as("src"), (col("l_suppkey") * 2L + 1L).as("dst"))
      .distinct()
    val es = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    PageRank.ranksPpm(es, rounds = 3)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c4_line_filter" -> (c4LineFilter _),
    "line_dedup"     -> (lineDedup _),
    "ngram_lm_score" -> (ngramLmScore _),
    "pagerank"       -> (pagerank _))

  // ---------------------------------------------------------------- oracles

  private def dotHashSql =
    TF.portableHashSql("doc_id || ':' || pos || ':' || line_raw", "c4dot")

  /** One damped PageRank round in SQL: `prev` -> a new rank CTE pair. */
  private def prRoundSql(i: Int, prev: String): String =
    s"""i$i AS (
      |  SELECT es.dst AS nid, sum(r.rank_ppm // d.outdeg) AS in_ppm
      |  FROM es JOIN $prev r ON es.src = r.nid JOIN deg d ON es.src = d.src
      |  GROUP BY es.dst
      |), r$i AS (
      |  SELECT n.nid, 150000 + (85 * coalesce(i.in_ppm, 0)) // 100 AS rank_ppm
      |  FROM n LEFT JOIN i$i i ON n.nid = i.nid
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "c4_line_filter" ->
      s"""WITH $linesCtes, d AS (
        |  SELECT doc_id, pos, line_raw, n_words,
        |         ($dotHashSql % 10 < 7) AS dot
        |  FROM lines
        |), k AS (
        |  SELECT doc_id, pos,
        |         CASE WHEN dot THEN line_raw || '.' ELSE line_raw END AS line,
        |         (dot AND n_words >= 5 AND position('spark' IN line_raw) = 0) AS keep
        |  FROM d
        |)
        |SELECT doc_id, count(*) AS n_lines,
        |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(CASE WHEN sum(CASE WHEN keep THEN 1 ELSE 0 END) >= 3
        |            THEN 1 ELSE 0 END AS BIGINT) AS keep_doc,
        |       substr(md5(coalesce(array_to_string(
        |         list(line ORDER BY pos) FILTER (WHERE keep),
        |         chr(10)), '')), 1, 16) AS fp
        |FROM k GROUP BY doc_id""".stripMargin,
    "line_dedup" ->
      s"""WITH $linesCtes, h AS (
        |  SELECT doc_id, pos, line_raw,
        |         ${TF.portableHashSql("line_raw", "linedup")} AS lh,
        |         doc_id * 100000 + pos AS okey
        |  FROM lines
        |), f AS (SELECT lh, min(okey) AS first_key FROM h GROUP BY lh)
        |SELECT doc_id, count(*) AS n_lines,
        |       CAST(sum(CASE WHEN okey = first_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       substr(md5(coalesce(array_to_string(
        |         list(line_raw ORDER BY pos) FILTER (WHERE okey = first_key),
        |         chr(10)), '')), 1, 16) AS fp
        |FROM h JOIN f USING (lh) GROUP BY doc_id""".stripMargin,
    "ngram_lm_score" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
        |), bg AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM toks, LATERAL unnest(generate_series(1, len(t)-1)) AS u(i)
        |  WHERE len(t) >= 2
        |), train AS (SELECT * FROM bg WHERE doc_id % 5 <> 0),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM train GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM train GROUP BY w1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM (
        |  SELECT unnest(string_split_regex(text, '\\s+')) AS tok
        |  FROM documents WHERE doc_id % 5 <> 0)),
        |db AS (SELECT doc_id, w1, w2, count(*) AS cnt FROM bg GROUP BY doc_id, w1, w2),
        |lp AS (
        |  SELECT d.doc_id, d.cnt,
        |    CAST(floor(ln(CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE)
        |      / (coalesce(c1.c1, 0) + v.v)) * 1000000.0) AS BIGINT) AS lp_ppm
        |  FROM db d LEFT JOIN c2 ON d.w1 = c2.w1 AND d.w2 = c2.w2
        |            LEFT JOIN c1 ON d.w1 = c1.w1, v
        |)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |       CAST((-sum(cnt * lp_ppm)) // sum(cnt) AS BIGINT) AS avg_nll_ppm,
        |       CAST(CASE WHEN (-sum(cnt * lp_ppm)) // sum(cnt) <= $LmThreshold
        |            THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM lp GROUP BY doc_id""".stripMargin,
    "pagerank" ->
      s"""WITH e AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |), es AS (
        |  SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
        |), deg AS (SELECT src, count(*) AS outdeg FROM es GROUP BY src),
        |n AS (SELECT DISTINCT src AS nid FROM es),
        |r0 AS (SELECT nid, CAST(1000000 AS BIGINT) AS rank_ppm FROM n),
        |${prRoundSql(1, "r0")},
        |${prRoundSql(2, "r1")},
        |${prRoundSql(3, "r2")}
        |SELECT r3.nid, CAST(r3.rank_ppm AS BIGINT) AS rank_ppm,
        |       CAST(d.outdeg AS BIGINT) AS outdeg
        |FROM r3 JOIN deg d ON r3.nid = d.src""".stripMargin)
}
