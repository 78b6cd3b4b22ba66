package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.PageRank

/** Invariants, known answers, and plan audits for the corpus-curation
  * wave (C4 line filter, corpus-wide line dedup, bigram-LM perplexity
  * filter, PageRank). Value parity vs DuckDB is the driver's
  * CORRECTNESS gate; these pin semantics the hash alone can't name. */
class CurationQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("c4_line_filter: count consistency and verdict rule") {
    val r = CurationQueries.c4LineFilter(spark, dir).cache()
    try {
      assert(r.count() == graft.Tables.documents(spark, dir).count())
      assert(r.filter(col("n_kept") > col("n_lines")).count() == 0)
      assert(r.filter((col("n_kept") >= 3) =!= (col("keep_doc") === 1L)).count() == 0)
      // Line arithmetic: n_lines = ceil(tokens/8) per document.
      val expected = graft.Tables.documents(spark, dir)
        .select(col("doc_id"),
          expr("(size(split(text, '\\\\s+')) + 7) div 8").as("want"))
      assert(r.join(expected, "doc_id")
        .filter(col("n_lines") =!= col("want")).count() == 0)
    } finally r.unpersist()
  }

  test("line_dedup: every distinct line survives exactly once corpus-wide") {
    val r = CurationQueries.lineDedup(spark, dir).cache()
    try {
      val totalKept = r.agg(sum(col("n_kept"))).head().getLong(0)
      // Independent recount of distinct lines via the same decomposition.
      val distinctLines = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
        .filter(size(col("toks")) > 0)
        .withColumn("pos", explode(expr("sequence(1, (size(toks) + 7) div 8)")))
        .select(expr("array_join(slice(toks, (pos - 1) * 8 + 1, 8), ' ')").as("line"))
        .distinct().count()
      assert(totalKept == distinctLines,
        s"kept $totalKept vs $distinctLines distinct lines")
      assert(r.filter(col("n_kept") > col("n_lines")).count() == 0)
    } finally r.unpersist()
  }

  test("ngram_lm_score: coverage, verdict rule, and both branches real") {
    val r = CurationQueries.ngramLmScore(spark, dir).cache()
    try {
      val withBigrams = graft.Tables.documents(spark, dir)
        .filter(size(split(col("text"), "\\s+")) >= 2).count()
      assert(r.count() == withBigrams)
      assert(r.filter(col("avg_nll_ppm") <= 0).count() == 0)
      assert(r.filter((col("avg_nll_ppm") <= 3400000L) =!= (col("keep") === 1L))
        .count() == 0)
      assert(r.filter(col("keep") === 1L).count() > 0)
      assert(r.filter(col("keep") === 0L).count() > 0)
    } finally r.unpersist()
  }

  test("ngram_lm_score: model joins broadcast, no nested loop") {
    val p = CurationQueries.ngramLmScore(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("PageRank: hand-computed two-round path graph") {
    import spark.implicits._
    // 1-2-3 path, symmetric. Round 1: r=(575000, 1850000, 575000);
    // round 2: in(1)=1850000 div 2, r2(1)=150000+85*925000 div 100.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = PageRank.ranksPpm(edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (936250L, 1L), 2L -> (1127500L, 2L), 3L -> (936250L, 1L)))
  }

  test("PageRank: dangling node evaporates mass, reports outdeg 0") {
    import spark.implicits._
    val got = PageRank.ranksPpm(Seq((1L, 2L)).toDF("src", "dst"), rounds = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (150000L, 1L), 2L -> (1000000L, 0L)))
  }

  test("PageRank: partitioning-invariant (integer arithmetic, no double sums)") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val a = PageRank.ranksPpm(base.repartition(1), 3).collect().toSet
    val b = PageRank.ranksPpm(base.repartition(7), 3).collect().toSet
    assert(a == b)
  }

  test("bm25_rank: exactly the docs containing a query term, n_hit bounded") {
    val r = CurationQueries.bm25Rank(spark, dir).cache()
    try {
      val expected = graft.Tables.documents(spark, dir)
        .filter(col("text").rlike("(^| )(spark|table|query)( |$)")).count()
      assert(r.count() == expected)
      assert(r.filter(col("n_hit") < 1 || col("n_hit") > 3).count() == 0)
    } finally r.unpersist()
  }

  test("dsir_weights: the en target slice scores highest per-bigram") {
    val r = CurationQueries.dsirWeights(spark, dir)
    val byLang = r.join(graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg((sum(col("weight_ppm")) / sum(col("n_bigrams"))).as("w"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val en = byLang("en")
    assert(byLang.filter(_._1 != "en").values.forall(_ < en),
      s"en must dominate its own target model: $byLang")
  }

  test("source_quality_filter: verdict is a pure function of the source") {
    val r = CurationQueries.sourceQualityFilter(spark, dir).cache()
    try {
      assert(r.count() == graft.Tables.documents(spark, dir).count())
      assert(r.groupBy(col("source"))
        .agg(countDistinct(col("src_keep")).as("nv"))
        .filter(col("nv") =!= 1).count() == 0)
      assert(r.filter(
        ((col("mean_len_ppm") >= 285000000L) && (col("short_ppm") <= 400000L))
          =!= (col("src_keep") === 1L)).count() == 0)
    } finally r.unpersist()
  }

  test("centroid_classify: full coverage, in-sample accuracy well above chance") {
    val r = CurationQueries.centroidClassify(spark, dir).cache()
    try {
      assert(r.count() ==
        graft.Tables.embeddings(spark, dir).count())
      assert(r.filter(col("d_best") < 0).count() == 0)
      // 10 labels -> 10% chance; the train slice must beat 2x chance
      // (labels are learnable in-sample even on synthetic data).
      val train = r.filter(col("vec_id") % 10 < 8)
      val acc = train.agg(sum(col("correct"))).head().getLong(0).toDouble /
        train.count()
      assert(acc > 0.2, s"in-sample accuracy $acc at chance level")
    } finally r.unpersist()
  }

  test("k_anonymity: suppressed groups are exactly those below k") {
    val r = CurationQueries.kAnonymity(spark, dir).cache()
    try {
      assert(r.count() == graft.Tables.customer(spark, dir).count())
      // Every surviving (nation_q, segment_q) pair except the mask
      // must have >= 8 members; masked rows exist at this sf.
      val kept = r.filter(col("suppressed") === 0L)
        .groupBy(col("nation_q"), col("segment_q")).count()
      assert(kept.filter(col("count") < 8).count() == 0)
      assert(r.filter(col("suppressed") === 1L).count() > 0)
      assert(r.filter(col("suppressed") === 1L)
        .filter(col("nation_q") =!= "*" || col("segment_q") =!= "*")
        .count() == 0)
    } finally r.unpersist()
  }

  test("curation_funnel: one ledger row per document, stage columns equal the " +
      "stage operators' own verdicts, keep_all is their conjunction") {
    val r = CurationQueries.curationFunnel(spark, dir).cache()
    try {
      assert(r.count() == graft.Tables.documents(spark, dir).count())
      val c4 = CurationQueries.c4LineFilter(spark, dir)
        .select(col("doc_id"), col("keep_doc"))
      assert(r.join(c4, "doc_id").filter(col("keep_c4") =!= col("keep_doc"))
        .count() == 0)
      val src = CurationQueries.sourceQualityFilter(spark, dir)
        .select(col("doc_id"), col("src_keep"))
      assert(r.join(src, "doc_id").filter(col("keep_src") =!= col("src_keep"))
        .count() == 0)
      assert(r.filter(col("keep_all") =!=
        col("keep_exact") * col("keep_c4") * col("keep_src")).count() == 0)
      // The funnel actually narrows: some docs drop, some survive all gates.
      assert(r.filter(col("keep_all") === 1L).count() > 0)
      assert(r.filter(col("keep_all") === 0L).count() > 0)
    } finally r.unpersist()
  }

  test("rrf_fusion: fused score decomposes to the RRF formula; ranks bounded " +
      "and doc_ids unique") {
    val r = CurationQueries.rrfFusion(spark, dir).cache()
    try {
      assert(r.count() <= 200 && r.count() > 0)
      assert(r.select(col("doc_id")).distinct().count() == r.count())
      assert(r.filter(col("lex_rank") < 0 || col("lex_rank") > 100 ||
        col("sem_rank") < 0 || col("sem_rank") > 100).count() == 0)
      // rrf_ppm is exactly the sum of the per-ranker reciprocal terms
      // (0 for a list the doc missed).
      val want =
        when(col("lex_rank") > 0, expr("1000000 div (60 + lex_rank)")).otherwise(0L) +
        when(col("sem_rank") > 0, expr("1000000 div (60 + sem_rank)")).otherwise(0L)
      assert(r.filter(col("rrf_ppm") =!= want).count() == 0)
      // Both-lists overlap is real at this sf (the fusion branch with
      // two reciprocal terms is actually exercised).
      assert(r.filter(col("lex_rank") > 0 && col("sem_rank") > 0).count() > 0)
    } finally r.unpersist()
  }

  test("l_diversity: suppression is exactly the groups below l distinct " +
      "sensitive bands; quasi-identifiers masked, keys untouched") {
    val r = CurationQueries.lDiversity(spark, dir).cache()
    try {
      val cust = graft.Tables.customer(spark, dir)
      assert(r.count() == cust.count())
      // Independent recount of per-group sensitive diversity.
      val want = cust.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(countDistinct(floor(col("c_acctbal") / 2000d).cast("long")).as("d"))
        .withColumn("want_sup", when(col("d") < 5, 1L).otherwise(0L))
      val joined = cust.select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
        .join(want, Seq("c_nationkey", "c_mktsegment"))
        .join(r, "c_custkey")
      assert(joined.filter(col("suppressed") =!= col("want_sup")).count() == 0)
      // Masked rows hide BOTH quasi columns; unmasked render verbatim.
      assert(r.filter(col("suppressed") === 1L)
        .filter(col("nation_q") =!= "*" || col("segment_q") =!= "*").count() == 0)
      assert(joined.filter(col("suppressed") === 0L)
        .filter(col("nation_q") =!= col("c_nationkey").cast("string") ||
          col("segment_q") =!= col("c_mktsegment")).count() == 0)
    } finally r.unpersist()
  }

  test("pagerank query: symmetric graph conserves mass up to truncation loss") {
    val r = CurationQueries.pagerank(spark, dir).cache()
    try {
      val n = r.count()
      val total = r.agg(sum(col("rank_ppm"))).head().getLong(0)
      // Each node loses < outdeg ppm to per-edge division truncation and
      // < 1 ppm to the damping division, per round; bound loosely.
      val maxLoss = 3L * (r.agg(sum(col("outdeg"))).head().getLong(0) + n)
      assert(total <= n * 1000000L, s"total $total above start mass")
      assert(total >= n * 1000000L - maxLoss, s"total $total lost > $maxLoss")
    } finally r.unpersist()
  }

  test("LabelProp: hand-computed path graph — clamped seeds, tie to smaller label") {
    import spark.implicits._
    // Path 1-2-3-4-5 (symmetrized), seeds: 1 -> 10, 5 -> 20.
    // Round 1: 2 <- 10, 4 <- 20, 3 unreachable (both neighbors NULL).
    // Round 2: 3 sees {10, 20} — tie breaks to 10; 2 and 4 unchanged.
    // Round 3: 4 sees {10 (from 3), 20 (from 5)} — tie flips 4 to 10;
    //          seeds 1 and 5 stay clamped throughout.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val edges = e.union(e.select($"dst".as("src"), $"src".as("dst")))
    val seeds = Seq((1L, 10L), (5L, 20L), (99L, 30L)).toDF("nid", "label")
    val r = graft.graph.LabelProp.propagate(edges, seeds, rounds = 3)
      .collect().map(x => x.getLong(0) -> (x.get(1), x.getBoolean(2))).toMap
    assert(r == Map(
      1L -> (10L, true), 2L -> (10L, false), 3L -> (10L, false),
      4L -> (10L, false), 5L -> (20L, true)),
      s"got $r")
    // Seed for node 99 (outside the graph) is ignored, not emitted.
    assert(!r.contains(99L))
  }

  test("label_prop query: seeds keep their nation label; both branches real") {
    val r = CurationQueries.labelProp(spark, dir).cache()
    try {
      val seeded = r.filter(col("seeded") === 1L)
      assert(seeded.count() > 0)
      // Every seeded node reports exactly its supplier nation key.
      val supp = graft.Tables.supplier(spark, dir)
        .filter(col("s_suppkey") % 4 === 0)
        .select((col("s_suppkey") * 2L + 1L).as("nid"),
          col("s_nationkey").cast("long").as("want"))
      assert(seeded.join(supp, "nid").filter(col("label") =!= col("want"))
        .count() == 0)
      // Propagation reached unlabeled nodes.
      assert(r.filter(col("seeded") === 0L && col("label").isNotNull).count() > 0)
    } finally r.unpersist()
  }
}
