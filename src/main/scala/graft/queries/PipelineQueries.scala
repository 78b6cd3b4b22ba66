package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{TextFunctions => TF}

/** Training-data curation operators beyond dedup/similarity: the
  * filters and layout steps an LLM data pipeline runs between "raw
  * corpus" and "tokenized shards". All oracle-checked (BIGINT/VARCHAR
  * outputs only, scaled-integer fractions per the EtlQueries
  * canonicalization rule).
  *
  *  - [[repetitionStats]] — Gopher-style within-document repetition
  *    filters (duplicate-2-gram fraction, top-2-gram fraction);
  *  - [[decontaminate]] — benchmark decontamination: flag training
  *    docs sharing an n-gram with a (small) held-out eval set;
  *  - [[packSequences]] — deterministic greedy sequence packing:
  *    assign each document its token offset and context-window bin
  *    within a hash-sharded, doc_id-ordered stream.
  */
object PipelineQueries {

  private val PackLen = 2048L
  private val PackShards = 8
  private val ChunkWin = 32
  private val ChunkStride = 24
  private val SampleK = 64
  /** Pinned mixture-target weights (ppm of the resampled corpus) for
    * [[domainMix]] — languages absent from the map are dropped. */
  private val MixWeights: Seq[(String, Long)] = Seq(
    "en" -> 400000L, "de" -> 150000L, "es" -> 150000L,
    "fr" -> 150000L, "zh" -> 150000L)
  private val ContamN = 5
  /** Token budget for [[tokenBudgetSelect]] — partial selection at
    * every driver sf (sf0.01's corpus is ~50k tokens). */
  private val TokenBudget = 20000L
  /** n_chars range width of the prefix-sum bands — coarse enough that
    * band count stays a few hundred at any corpus, fine enough that no
    * band holds a macroscopic corpus fraction. */
  private val BudgetBandWidth = 64L
  /** Vocabulary size of [[oovRate]]'s frequent-trigram list. */
  private val OovTopK = 500
  private val ShuffleShards = 16
  private val ShuffleSeed = "epoch0"
  private val SourceCap = 10
  private val VocabK = 200

  /** Within-document repetition metrics (the Gopher/C4 repetition
    * filters): for each doc, the fraction of 2-gram INSTANCES whose
    * 2-gram occurs more than once (`frac_dup_2gram`), and the fraction
    * claimed by the single most frequent 2-gram (`frac_top_2gram`);
    * docs breaching either threshold get verdict 'drop'.
    *
    * Shape at scale: explode + two hash aggregations (both combine
    * map-side) — never a per-row interpreted array fold. Documents too
    * short to have a 2-gram keep zero fractions and verdict 'keep'
    * via the left join back to the corpus. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    val grams = docs.select(col("doc_id"),
        explode(TF.wordNgrams(TF.tokens(col("text")), 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
    val perDoc = grams.groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("total"),
      count(lit(1)).as("n_distinct"),
      max(col("cnt")).as("top"))
    val dup = col("total") - col("n_distinct")
    val fracDup = floor(dup.cast("double") / col("total").cast("double") * 1e6 + 0.5d)
    val fracTop = floor(col("top").cast("double") / col("total").cast("double") * 1e6 + 0.5d)
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("total"), lit(0L)).as("n_2grams"),
        coalesce(fracDup, lit(0L)).as("frac_dup_2gram_c"),
        coalesce(fracTop, lit(0L)).as("frac_top_2gram_c"))
      // Gopher-flavored thresholds on the scaled-integer fractions
      // (exactly reproducible in the oracle — no double comparison).
      .withColumn("verdict",
        when(col("frac_dup_2gram_c") > 200000L ||
             col("frac_top_2gram_c") > 180000L, lit("drop"))
          .otherwise(lit("keep")))
  }

  /** Benchmark decontamination: the eval set is the deterministic
    * `doc_id % 97 = 0` corpus slice (standing in for a benchmark
    * suite); a training doc is contaminated iff it shares at least one
    * word [[ContamN]]-gram with ANY eval doc. Output covers every
    * training doc with its distinct-shared-gram count.
    *
    * Shape at scale: the eval side of the join is tiny by construction
    * (benchmarks are MBs, the corpus is TBs), so the gram join is a
    * BROADCAST semi-ish join — the training side never shuffles. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(TF.wordNgrams(TF.tokens(col("text")), ContamN)))
        .as("g"))
    val evalGrams = grams.filter(col("doc_id") % 97 === 0)
      .select(col("g")).distinct()
    val hits = grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .filter(col("doc_id") % 97 =!= 0)
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit_grams"),
        when(col("n_hit").isNotNull, lit(1L)).otherwise(lit(0L))
          .as("contaminated"))
  }

  /** Deterministic greedy sequence packing: documents are hash-sharded
    * ([[TF.portableHash]] mod [[PackShards]] — reproducible on any
    * cluster at any parallelism), ordered by doc_id within a shard,
    * and concatenated into [[PackLen]]-token context windows; each doc
    * records its exclusive-cumsum token offset and the bin its first
    * token lands in.
    *
    * Shape at scale: ONE window per (lang, shard) partition — the
    * parallelism is #langs x #shards (shard count scales with the
    * cluster, 8 here for a 32-core box), and each window is a linear
    * running sum, not a sort-heavy rank. This is the layout step that
    * turns a curated corpus into trainer-ready shards. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        pmod(TF.portableHash(col("doc_id").cast("string"), "shard"),
          lit(PackShards.toLong)).as("shard"),
        size(TF.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_bin", floor(col("start_off") / PackLen))
  }

  /** Gap-based sessionization of the event log via Spark's NATIVE
    * `session_window` (merging-window aggregation, codegen'd): events
    * of a user belong to one session while each is within 12 hours of
    * the previous; the session end is last-event + gap, per
    * session_window's contract. The oracle is an INDEPENDENT
    * formulation (lag + running-sum session ids), so the hash match
    * validates Spark's merge semantics, not just our arithmetic.
    *
    * Shape at scale: one shuffle on user_id, sessions merge inside
    * the aggregation — no self-join, no per-session explode; the same
    * expression runs unchanged over `readStream` with a watermark
    * (Structured Streaming's native session windows). */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "12 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
        col("n_events"))

  /** Deterministic global corpus shuffle — the reproducible training
    * order step: each document lands in a pseudorandom shard (portable
    * hash mod [[ShuffleShards]]) at a pseudorandom position within it
    * (hash-ordered). The permutation is a pure function of (doc_id,
    * seed) — independent of input partitioning, parallelism, or
    * engine — so every epoch's read order is reproducible anywhere.
    *
    * Shape at scale: one hash exchange on `shard` + a per-shard sort —
    * the distributed analog of `ORDER BY random()`, without a global
    * single-reducer sort: shard count scales with the cluster, and
    * trainers consume shards as independent files anyway. */
  def globalShuffle(spark: SparkSession, dir: String): DataFrame = {
    val h = TF.portableHash(col("doc_id").cast("string"), ShuffleSeed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col("doc_id"))
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(ShuffleShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Overlapping sliding-window chunking — the context-window
    * preparation step between "cleaned document" and "training
    * sequence": each document splits into [[ChunkWin]]-token windows
    * advancing by [[ChunkStride]] tokens (so consecutive chunks share
    * `ChunkWin - ChunkStride` tokens of context), with the token
    * offset carried so spans map back to the source. Empty documents
    * produce no chunks; the final chunk may be short.
    *
    * Shape at scale: tokenize + `explode(sequence(...))` + slice — a
    * pure per-row projection pipeline with NO shuffle, no window, no
    * join; it rides the scan and parallelizes with input splits. */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    docs.select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), col("n") - 1, lit(ChunkStride)))
          .as("s"))
      .select(col("doc_id"),
        floor(col("s").cast("double") / ChunkStride).cast("long")
          .as("chunk_idx"),
        col("s").cast("long").as("start_tok"),
        size(slice(col("toks"), col("s") + 1, lit(ChunkWin)))
          .cast("long").as("chunk_len"),
        array_join(slice(col("toks"), col("s") + 1, lit(ChunkWin)), " ")
          .as("chunk_text"))
  }

  /** Mixture resampling to pinned per-domain target weights — the
    * data-mixing step that turns "whatever the crawl yielded" into
    * the proportions the training run was designed around. The
    * largest total sample `S` every domain can supply its
    * [[MixWeights]] share of is derived relationally
    * (`S = min_d floor(n_d / w_d)` in ppm arithmetic), each domain
    * gets an integer acceptance rate `rate_ppm = t_d / n_d`, and a
    * document survives iff its portable hash lands under the rate —
    * deterministic, partition-independent, engine-independent.
    * Downsampling only (rates never exceed 1e6 ppm by construction);
    * domains outside the weight map drop out.
    *
    * Shape at scale: one map-side-combined count per domain (a few
    * rows), a broadcast of the 5-row rate frame back onto the corpus,
    * and a codegen'd hash filter — the corpus itself never shuffles.
    * Integer envelope: exact while `n_d` < 2^53/1e6 ≈ 9e9 docs per
    * domain (the divide+floor is then bit-identical across engines). */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val wExpr = MixWeights.tail
      .foldLeft(when(col("lang") === MixWeights.head._1,
        lit(MixWeights.head._2))) {
        case (acc, (l, w)) => acc.when(col("lang") === l, lit(w))
      }.otherwise(lit(0L))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_d"))
      .withColumn("w_ppm", wExpr)
      .filter(col("w_ppm") > 0)
      .withColumn("cap",
        floor((col("n_d") * lit(1000000L)).cast("double") / col("w_ppm")))
    // Global min over the |domains|-row counts frame via an
    // unpartitioned window (a handful of rows — no scalar cross join,
    // keeping the no-nested-loop plan invariant).
    val rates = counts
      .withColumn("s_total", min(col("cap")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .withColumn("t_d",
        floor((col("w_ppm") * col("s_total")).cast("double") / lit(1e6)))
      .withColumn("rate_ppm",
        floor((col("t_d") * lit(1000000L)).cast("double") / col("n_d")))
      .select(col("lang"), col("rate_ppm"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(pmod(TF.portableHash(col("doc_id").cast("string"), "mix"),
        lit(1000000L)) < col("rate_ppm"))
      .select(col("doc_id"), col("lang"))
  }

  /** Weighted priority sampling (Duffield-Lund-Thorup): draw
    * [[SampleK]] documents with probability proportional to size
    * (`n_chars`) by ranking on `priority = w / u` with `u` a
    * deterministic per-doc uniform from the portable hash — the
    * standard one-pass weighted sample for "give me a size-biased
    * slice of the corpus" QA draws and subsample studies. Priorities
    * live in the scaled-integer domain (`floor(w·2^30 / (h30+1))`),
    * so the ranking replays bit-identically in any engine; ties break
    * on doc_id.
    *
    * Shape at scale: a per-row projection + global top-k — Spark
    * compiles the sort+limit to `TakeOrderedAndProject` (per-partition
    * bounded heaps, never a full sort). */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val h30 = pmod(TF.portableHash(col("doc_id").cast("string"), "wsample"),
      lit(1073741824L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").as("w"), h30.as("h"))
      .withColumn("priority",
        floor((col("w") * lit(1073741824L)).cast("double")
          / (col("h") + lit(1L))))
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(SampleK)
      .select(col("doc_id"), col("w"), col("priority"))
  }

  /** Corpus-level PII redaction — the scrubbing pass a training corpus
    * gets before tokenization (the corpus-side companion of the
    * reference's warehouse-side PII hashing, `etl/PiiHash`): emails,
    * dashed phone numbers, and bare 9-digit identifiers replaced with
    * typed placeholder tokens, with per-doc detection counts kept for
    * the audit trail. The synthetic corpus contains no PII, so a
    * deterministic slice (doc_id % 5 = 0) gets PII INJECTED first —
    * derived identically in the oracle SQL, the same convention as
    * EtlQueries' derived nullable key — so the redaction paths are
    * really exercised. Patterns are chosen to parse identically under
    * Java regex and RE2 (DuckDB).
    *
    * Shape at scale: a pure projection — counts and three chained
    * regexp_replace calls, all codegen'd, no shuffle, rides the scan. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
    val idRe = "\\b\\d{9}\\b"
    val dirty = when(col("doc_id") % 5 === 0, concat(
      col("text"), lit(" contact user"), col("doc_id"),
      lit("@example.com or 555-"),
      lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 3, "0"),
      lit("-"),
      lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
      lit(" id "),
      lpad(pmod(col("doc_id"), lit(1000000000L)).cast("string"), 9, "0")))
      .otherwise(col("text"))
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), dirty.as("dirty"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("dirty"), lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("dirty"), lit(phoneRe), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("dirty"), lit(idRe), lit(0)))
          .cast("long").as("n_ids"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("dirty"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"),
          idRe, "<ID>").as("redacted"))
  }

  /** Corpus-statistics quality score (the CCNet-style idea with the
    * n-gram model reduced to membership): each doc's out-of-vocabulary
    * rate against the corpus's [[OovTopK]] most frequent word
    * trigrams — boilerplate and fluent text sit low, gibberish and
    * junk sit high. Two passes: the top-K list (global aggregate +
    * bounded top-k, a few hundred rows) broadcasts back, and each
    * doc's grams probe it — the corpus never shuffles for the probe.
    * Docs with no trigram (< 3 tokens) are excluded (rate undefined). */
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    // All three consumers (top-gram model, hit counts, gram totals)
    // DERIVE from one per-(doc, gram) aggregate, so the 3-gram
    // explode materializes once and rides a single reused exchange
    // (sums of per-doc counts == direct counts; grouping keys are
    // not prunable and cnt is consumed by every side). The null
    // pre-filters neutralize join-key isnotnull inference that
    // would otherwise push into one branch's copy alone (ids and
    // grams are never null; values unchanged). Plan-audited.
    val perDocGram = docs.select(col("doc_id"),
        explode(TF.wordNgrams(TF.tokens(col("text")), 3)).as("g"))
      .filter(col("doc_id").isNotNull && col("g").isNotNull)
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
    val top = perDocGram.groupBy(col("g")).agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("g").asc).limit(OovTopK)
      .select(col("g"))
    val perDoc = perDocGram.join(broadcast(top), Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(sum(col("cnt")).as("n_hit"))
    perDocGram.groupBy(col("doc_id")).agg(sum(col("cnt")).as("n_grams"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        floor((col("n_grams") - coalesce(col("n_hit"), lit(0L)))
          .cast("double") * 1e6 / col("n_grams")).cast("long")
          .as("oov_ppm"))
  }

  /** Quality-ranked corpus selection under a token budget — the "fill
    * the training run's N-token budget with the best documents" step:
    * rank docs by (n_chars DESC, doc_id ASC) and keep every doc whose
    * running token total BEFORE it is under [[TokenBudget]] (so the
    * boundary doc that crosses the budget is included, and selection
    * is a deterministic prefix of the global order).
    *
    * The interesting part at 100 TB is the global ordered prefix sum:
    * a naive `sum() OVER (ORDER BY ...)` is a SINGLE-partition window
    * — one task sorts the corpus. This implements the standard
    * two-level decomposition instead: (1) coarse range bands of the
    * order key (n_chars DIV [[BudgetBandWidth]] — band order is
    * consistent with the global order by construction), (2) per-band
    * token totals (a few-hundred-row frame) get exclusive band
    * offsets via a window over that tiny frame only, (3) the offsets
    * broadcast back and each band computes its LOCAL prefix sum in a
    * band-partitioned window. No corpus-wide sort, no single-partition
    * stage; the oracle replays the plain global window and the hash
    * proves the decomposition exact. */
  def tokenBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_chars"),
        size(TF.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("band",
        floor(col("n_chars").cast("double") / BudgetBandWidth).cast("long"))
    val offsets = docs.groupBy(col("band"))
      .agg(sum(col("n_tok")).as("band_tok"))
      .withColumn("offset", coalesce(
        sum(col("band_tok")).over(
          W.partitionBy(lit(1)).orderBy(col("band").desc)
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("band"), col("offset"))
    val inBand = W.partitionBy(col("band"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .rowsBetween(W.unboundedPreceding, -1)
    docs.join(broadcast(offsets), Seq("band"))
      .withColumn("cum_before",
        col("offset") + coalesce(sum(col("n_tok")).over(inBand), lit(0L)))
      .filter(col("cum_before") < TokenBudget)
      .select(col("doc_id"), col("n_tok"), col("cum_before"))
  }

  /** Per-source quota cap (the CommonCrawl-style domain cap): keep at
    * most [[SourceCap]] documents per source, preferring longer ones
    * ((n_chars DESC, doc_id ASC) — a deterministic total order).
    *
    * Written as the NAIVE single row_number window — the form users
    * write, and the classic hot-domain skew trap (one giant crawl
    * domain sorts in one task). The engine's
    * [[graft.plans.RankOneToAggregate]] rule rewrites it into the
    * bounded-heap [[graft.plans.TopKByAgg]] partial aggregate: each map
    * task keeps at most [[SourceCap]] rows per source, so the shuffle
    * carries N x |tasks| rows per source instead of all of them, and no
    * task inherits a whole hot domain (plan-asserted in
    * PlanAuditSpec; the measured gap is the `skew_cap_*` bench pair in
    * EtlQueries). The doc_id tiebreak rides as `-doc_id` DESC —
    * order-equivalent to doc_id ASC for positive ids — because the
    * rewrite (deliberately) fires only on uniform sort direction, where
    * Catalyst struct ordering matches the window's SortOrder. The
    * hand-salted two-phase formulation this replaces is preserved as
    * the measured strawman territory in the skew bench family. */
  def sourceCap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, (-col("doc_id")).desc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= SourceCap)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("__rn").cast("long").as("keep_rank"))
  }

  /** Symmetric int8 scalar quantization of the embedding column — the
    * storage-scale path (4 bytes -> 1 byte per dimension; at 100 TB of
    * vectors that is the difference between one copy and four). Per
    * vector: scale = max |x_i|, q_i = round(x_i / scale * 127), so
    * q_i in [-127, 127] with the sign preserved and scale stored as
    * integer millionths for exact reconstruction bounds.
    *
    * Output is exploded to (vec_id, idx, q, scale_c) BIGINT rows for
    * the oracle hash; the production form would keep `array<tinyint>`.
    * The per-vector HOF fold runs ONCE per vector (not per pair, the
    * trap the native DotExpr exists for), so interpreted evaluation is
    * off the hot path by construction. */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    val s = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), s.as("__s"))
      .select(col("vec_id"),
        floor(col("__s") * lit(1e6) + 0.5d).cast("long").as("scale_c"),
        col("__s"),
        posexplode(col("embedding")).as(Seq("__i", "__x")))
      .select(col("vec_id"), (col("__i") + 1).cast("long").as("idx"),
        when(col("__s") === 0d, lit(0L))
          .otherwise(floor(col("__x").cast("double") / col("__s") * 127d + 0.5d)
            .cast("long")).as("q"),
        col("scale_c"))
  }

  /** Token-frequency vocabulary build: global top-[[VocabK]] tokens by
    * term frequency (ties broken lexicographically — a deterministic
    * cutoff), with document frequency alongside (the IDF ingredient).
    *
    * Shape at scale: the tf aggregation combines map-side; the exact
    * per-token document frequency needs one (token, doc_id) distinct
    * pass (the at-scale approximation is approx_count_distinct — the
    * exact/approx pairing `corpus_profile` already demonstrates); the
    * global top-K plans as TakeOrderedAndProject (per-partition heaps
    * + a K-row driver merge), never a global sort. */
  def vocabTopK(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(VocabK)

  /** Tokenizer ids for [[tokenizeIds]]: small enough that the corpus
    * has real out-of-vocabulary tokens (the testdata's distinct-token
    * count exceeds it ~2x). */
  private val TokenizerK = 16

  /** Vocabulary application: text -> token-id sequence, the
    * text-to-trainer handoff step. Ids are the vocabulary's
    * deterministic rank (1-based, tf desc / token asc — the same
    * cutoff order [[vocabTopK]] publishes); out-of-vocabulary tokens
    * map to 0. The id sequence is emitted as a comma-joined VARCHAR
    * (driver-hashable form of `array<bigint>`; a production sink would
    * keep the array).
    *
    * Shape at scale: the vocabulary is K rows — broadcast to the
    * exploded token stream, so the corpus never shuffles for the
    * lookup; the only corpus shuffle is the per-doc reassembly
    * (groupBy doc_id), whose map-side combine carries (pos, id) pairs.
    * The global rank window runs over K rows, not the corpus. */
  def tokenizeIds(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE materialized token stream (the bpeTokenize pattern): the
    // vocabulary tf-aggregate and the id-lookup probe both consume the
    // tokenize + explode projection, so they ride a single explicit
    // doc_id exchange (which the final per-doc reassembly needs
    // anyway — its groupBy inherits the partitioning, no further
    // corpus shuffle). The tf-aggregate reads the SAME posexploded
    // frame as the probe — the token multiset is identical, only the
    // unused pos column differs — and the `pos >= 0` pin keeps pos in
    // both consumers' column sets so the exchange subtrees stay
    // canonically equal (exchange reuse; plan-audited).
    val toks = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        posexplode(TF.tokens(col("text"))).as(Seq("pos", "token")))
      .repartition(col("doc_id"))
      .filter(col("pos") >= 0)
    val vocab = toks
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token").asc).limit(TokenizerK)
      .withColumn("tid", row_number().over(
        Window.orderBy(col("tf").desc, col("token").asc)).cast("long"))
      .select(col("token"), col("tid"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("tid"), lit(0L)).as("tid"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === 0L, 1L).otherwise(0L)).as("n_oov"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          s => s.getField("tid"))).as("ids_str"))
  }

  /** Pinned BPE merge table (rank order) for [[bpeTokenize]] — the
    * trainer-handoff artifact a real pipeline ships alongside the
    * corpus. 20 merges chosen so corpus words exercise every depth:
    * full multi-level collapses (table, value, scan, fast → one
    * piece), partial merges (data → [d, a, ta]; stream → [st, r, e,
    * a, m]), and the overlapping-pair case (agg: a g g → [ag, g] →
    * [agg] — LEFT-TO-RIGHT non-overlapping within a rank). */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "b" -> "l", "ta" -> "bl", "tabl" -> "e",
    "v" -> "a", "l" -> "u", "va" -> "lu", "valu" -> "e",
    "s" -> "c", "sc" -> "a", "sca" -> "n",
    "r" -> "o", "ro" -> "w",
    "k" -> "e", "ke" -> "y",
    "a" -> "g", "ag" -> "g",
    "s" -> "t", "f" -> "a", "fa" -> "st")

  /** BPE-apply as a pure string-function chain, no UDF: the token's
    * symbols are fenced as `|s1||s2||...|`, and each merge (a,b), in
    * rank order, is ONE literal `replace('|a||b|' -> '|ab|')`. Literal
    * replace scans left-to-right and resumes AFTER each substitution —
    * exactly BPE's non-overlapping greedy application — and the `|`
    * fences make partial-symbol matches impossible. The whole chain
    * (regexp char-split + 20 replaces + trim/split) stays inside
    * whole-stage codegen; DuckDB's `replace` has identical semantics,
    * so the oracle replays the chain verbatim. */
  private[queries] def bpePieces(tok: Column): Column = {
    val wrapped = regexp_replace(tok, "(.)", "\\|$1\\|")
    val merged = BpeMerges.foldLeft(wrapped) { case (s, (a, b)) =>
      call_function("replace", s, lit(s"|$a||$b|"), lit(s"|$a$b|"))
    }
    split(trim(merged, "|"), "\\|\\|")
  }

  /** Sub-word (BPE) tokenization with the pinned merge table — the
    * step [[tokenizeIds]] (whole-token vocab) stops short of: apply
    * [[BpeMerges]] to every token, id the resulting pieces by
    * deterministic alphabetical rank, and emit each doc's id sequence
    * (comma-joined VARCHAR, same driver-hashable form as
    * [[tokenizeIds]]).
    *
    * Shape at scale: the merge chain is a per-row projection (no
    * shuffle, no state); the piece vocabulary is tiny (sub-word
    * closure of the corpus alphabet) and broadcast; the only corpus
    * shuffles are the distinct for the vocab and the per-doc
    * reassembly — same envelope as [[tokenizeIds]]. */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        posexplode(TF.tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    // ONE materialized piece stream: the vocab (distinct) and the
    // id-lookup probe both consume the tokenize + merge-chain + explode
    // projection — the expensive part — so they must ride a single
    // explicit exchange, reused at runtime (the span_dedup pattern).
    // The exchange key is doc_id, which the final per-doc reassembly
    // needs anyway: the groupBy below inherits the partitioning and
    // pays NO further corpus shuffle. The `pos >= 0 AND pidx >= 0` pin
    // (true by construction — generator positions are 0-based — but
    // unprovable) sits on the SHARED frame so column pruning keeps
    // (pos, pidx) in BOTH consumers' copies of the exchange subtree;
    // without it the vocab branch would prune to (doc_id, piece), the
    // subtrees would stop canonicalizing equal, and the merge chain
    // would run twice (measured: two full tokenize passes).
    val pieces = toks.select(col("doc_id"), col("pos"),
        posexplode(bpePieces(col("tok"))).as(Seq("pidx", "piece")))
      .repartition(col("doc_id"))
      .filter(col("pos") >= 0 && col("pidx") >= 0)
    val vocab = pieces.select(col("piece")).distinct()
      .withColumn("pid",
        row_number().over(Window.orderBy(col("piece"))).cast("long"))
    pieces.join(broadcast(vocab), Seq("piece"))
      .groupBy(col("doc_id"))
      .agg(
        count_distinct(col("pos")).as("n_tokens"),
        count(lit(1)).as("n_pieces"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos"), col("pidx"), col("pid")))),
          s => s.getField("pid"))).as("ids_csv"))
  }

  /** The number of merge rounds [[bpeLearn]] runs — fixed and small so
    * the DuckDB oracle can replay the identical loop fully unrolled. */
  private[queries] val BpeLearnRounds = 8

  /** LEARN a BPE merge table from the corpus — the step [[bpeTokenize]]
    * (which APPLIES a pinned table) stops short of. Classic Sennrich
    * BPE training, expressed distributed:
    *
    *  1. collapse the corpus to a word-frequency dictionary (the
    *     standard trick: all pair statistics are reachable from
    *     (distinct token, freq), a vocabulary-sized frame, so the
    *     iterative loop never touches the corpus again);
    *  2. per round: count adjacent symbol pairs weighted by word
    *     frequency (one map-side-combining aggregate over the
    *     dictionary), take the argmax with a DETERMINISTIC tie-break
    *     (count desc, then left/right symbol ascending), and apply the
    *     merge as ONE codegen'd literal `replace` on the fenced symbol
    *     string (same non-overlapping left-to-right semantics as
    *     [[bpePieces]]);
    *  3. stop at [[BpeLearnRounds]] (the bounded-round-cap pattern of
    *     [[graft.text.Components]]) or when no pair remains.
    *
    * The per-round argmax is a ONE-ROW collect — the same bounded
    * driver envelope as [[graft.sim.KMeans]]'s k centers; everything
    * corpus-sized stays distributed. The dictionary is lineage-cut
    * per round (localCheckpoint / checkpoint) so the plan does not
    * grow with the replace chain.
    *
    * Output: one row per learned merge (rank, lhs, rhs, cnt). */
  def bpeLearn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def pin(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    var words = pin(Tables.spread(Tables.documents(spark, dir))
      .select(explode(TF.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("tok"), "(.)", "\\|$1\\|").as("sym"),
        col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= BpeLearnRounds && !exhausted) {
      // Adjacent pairs of the current symbolization: 0-based transform
      // index i pairs element i with i+1 (try_element_at is 1-based);
      // the trailing null pair is filtered out.
      val top = words
        .select(col("freq"), split(trim(col("sym"), "|"), "\\|\\|").as("l"))
        .select(col("freq"), explode(expr(
          "filter(transform(l, (x, i) -> " +
            "struct(x AS a, try_element_at(l, i + 2) AS b)), " +
            "p -> p.b IS NOT NULL)")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round.toLong, a, b, cnt))
        words = pin(words.withColumn("sym", call_function("replace",
          col("sym"), lit(s"|$a||$b|"), lit(s"|$a$b|"))))
        round += 1
      }
    }
    merges.toSeq.toDF("rank", "lhs", "rhs", "cnt")
  }

  /** TF-IDF document-term weighting, top-3 terms per document — the
    * classic relevance/keyword-extraction step completing the
    * vocabulary family ([[vocabTopK]] publishes the corpus stats;
    * this query scores terms IN CONTEXT). Weight = tf * ln(N/df),
    * canonicalized to floor-millionths: both engines compute the
    * identical double expression (cast-to-double division, natural
    * log, left-associated products), so the floored BIGINT cannot
    * diverge beyond a ~1-ulp-at-a-grid-point coincidence.
    *
    * Shape at scale: tf aggregates with map-side combine on
    * (doc, token); the df table is vocabulary-sized and broadcasts
    * here — at open-vocabulary scale, cap it first (the
    * [[tokenizeIds]] pattern) or let the token-hash shuffle join
    * stand; the per-doc top-3 window partitions by doc_id (bounded
    * groups, no hot key). */
  def tfIdf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.spread(Tables.documents(spark, dir))
    val toks = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
    val nDocs = docs.count()
    val tfs = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tfc"))
    // df(token) == number of (doc, token) groups, so it DERIVES from
    // tfs — the token stream tokenizes and aggregates once, and both
    // consumers ride tfs' one exchange (runtime ReusedExchange). The
    // `tfc >= 1` filter is true by construction (group counts are
    // positive) but unprovable, pinning the count buffer into this
    // side so pruning cannot drop it below the shared exchange and
    // break canonical subtree equality.
    val dfs = tfs.filter(col("tfc") >= 1)
      .groupBy(col("token")).agg(count(lit(1)).as("dfc"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("w_ppm").desc, col("token").asc)
    tfs.join(broadcast(dfs), Seq("token"))
      .withColumn("w_ppm",
        floor(col("tfc") * log(lit(nDocs.toDouble) / col("dfc")) * lit(1e6)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("token"), col("w_ppm"),
        col("rn").cast("long").as("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_tokenize"       -> (bpeTokenize _),
    "bpe_learn"          -> (bpeLearn _),
    "tf_idf"             -> (tfIdf _),
    "repetition_stats"   -> (repetitionStats _),
    "tokenize_ids"       -> (tokenizeIds _),
    "decontaminate"      -> (decontaminate _),
    "pack_sequences"     -> (packSequences _),
    "sessionize"         -> (sessionize _),
    "global_shuffle"     -> (globalShuffle _),
    "source_cap"         -> (sourceCap _),
    "embedding_quantize" -> (embeddingQuantize _),
    "vocab_topk"         -> (vocabTopK _),
    "chunk_documents"    -> (chunkDocuments _),
    "domain_mix"         -> (domainMix _),
    "weighted_sample"    -> (weightedSample _),
    "token_budget_select" -> (tokenBudgetSelect _),
    "pii_redact"         -> (piiRedact _),
    "oov_rate"           -> (oovRate _)
  )

  private val toksSql = "string_split_regex(text, '\\s+')"

  /** DuckDB VALUES rendering of [[MixWeights]], generated from the
    * SAME constant so the two sides cannot drift. */
  private val mixWeightsSql: String =
    MixWeights.map { case (l, w) => s"('$l', $w)" }.mkString(", ")

  /** DuckDB replay of [[bpePieces]]'s merge chain, generated from the
    * SAME [[BpeMerges]] constant so the two sides cannot drift. */
  private val bpeChainSql: String =
    BpeMerges.foldLeft("regexp_replace(tok, '(.)', '|\\1|', 'g')") {
      case (s, (a, b)) => s"replace($s, '|$a||$b|', '|$a$b|')"
    }

  /** DuckDB replay of [[bpeLearn]]'s training loop, fully unrolled to
    * [[BpeLearnRounds]] rounds (generated here so round count and
    * tie-break cannot drift from the Scala side). Each round: adjacent
    * pairs via two LOCKSTEP unnests of the shifted symbol list, argmax
    * with the identical (cnt DESC, a, b) tie-break, merge applied with
    * the same literal `replace`; an exhausted round's scalar subquery
    * coalesces to a never-matching sentinel so later rounds no-op,
    * matching the Scala loop's break. */
  private val bpeLearnOracleSqlGen: String = {
    val rounds = BpeLearnRounds
    val w0 =
      s"""w0 AS (
         |  SELECT regexp_replace(tok, '(.)', '|\\1|', 'g') AS sym,
         |         count(*) AS freq
         |  FROM (SELECT unnest($toksSql) AS tok FROM documents)
         |  WHERE len(tok) > 0 GROUP BY 1
         |)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq,
         |               unnest(l[1:len(l)-1]) AS a,
         |               unnest(l[2:len(l)]) AS b
         |        FROM (SELECT freq, string_split(trim(sym, '|'), '||') AS l
         |              FROM w${r - 1}))
         |  GROUP BY a, b
         |),
         |t$r AS (SELECT a, b, cnt FROM p$r
         |        ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |w$r AS (SELECT replace(sym,
         |          coalesce((SELECT '|'||a||'||'||b||'|' FROM t$r), chr(1)),
         |          coalesce((SELECT '|'||a||b||'|' FROM t$r), chr(1))) AS sym,
         |          freq
         |        FROM w${r - 1})""".stripMargin
    }
    val unions = (1 to rounds).map { r =>
      s"SELECT CAST($r AS BIGINT) AS rank, a AS lhs, b AS rhs, cnt FROM t$r"
    }.mkString("\n", "\nUNION ALL ", "")
    s"WITH ${(w0 +: roundCtes).mkString(",\n")}$unions"
  }

  private def ngramsSql(t: String, n: Int) =
    s"[array_to_string($t[i:i+${n - 1}], ' ') for i in generate_series(1, len($t)-${n - 1})]"

  val oracles: Map[String, String] = Map(
    "bpe_learn" -> bpeLearnOracleSqlGen,
    "bpe_tokenize" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(t) AS tok,
        |         unnest(generate_series(1, len(t))) AS pos
        |  FROM (SELECT doc_id, $toksSql AS t FROM documents)
        |), split_toks AS (
        |  SELECT doc_id, pos,
        |         string_split(trim($bpeChainSql, '|'), '||') AS ps
        |  FROM toks WHERE len(tok) > 0
        |), pieces AS (
        |  SELECT doc_id, pos, unnest(ps) AS piece,
        |         unnest(generate_series(1, len(ps))) AS pidx
        |  FROM split_toks
        |), vocab AS (
        |  SELECT piece, row_number() OVER (ORDER BY piece ASC) AS pid
        |  FROM (SELECT DISTINCT piece FROM pieces)
        |)
        |SELECT p.doc_id,
        |       CAST(count(DISTINCT p.pos) AS BIGINT) AS n_tokens,
        |       count(*) AS n_pieces,
        |       array_to_string(list(v.pid ORDER BY p.pos, p.pidx), ',')
        |         AS ids_csv
        |FROM pieces p JOIN vocab v USING (piece)
        |GROUP BY p.doc_id""".stripMargin,
    // Independent lag+cumsum formulation of session_window's merge
    // semantics: a new session starts when the gap to the previous
    // event is >= 12h (session_window merges on strict overlap,
    // next.ts < prev.ts + gap); end = last event + gap.
    "sessionize" ->
      """WITH o AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS e,
        |         lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pe
        |  FROM events
        |), m AS (
        |  SELECT user_id, ts,
        |    sum(CASE WHEN pe IS NULL OR e - pe >= 43200000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  strftime(max(ts) + INTERVAL 43200 SECONDS, '%Y-%m-%d %H:%M:%S') AS sess_end,
        |  count(*) AS n_events
        |FROM m GROUP BY user_id, sid""".stripMargin,
    "repetition_stats" ->
      s"""WITH g AS (
        |  SELECT doc_id, unnest(${ngramsSql(toksSql, 2)}) AS g FROM documents
        |), c AS (
        |  SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY 1, 2
        |), a AS (
        |  SELECT doc_id, sum(cnt) AS total, count(*) AS n_distinct,
        |         max(cnt) AS top
        |  FROM c GROUP BY 1
        |), s AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(total, 0) AS BIGINT) AS n_2grams,
        |    CAST(coalesce(floor(CAST(total - n_distinct AS DOUBLE)
        |      / CAST(total AS DOUBLE) * 1e6 + 0.5), 0) AS BIGINT) AS frac_dup_2gram_c,
        |    CAST(coalesce(floor(CAST(top AS DOUBLE)
        |      / CAST(total AS DOUBLE) * 1e6 + 0.5), 0) AS BIGINT) AS frac_top_2gram_c
        |  FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
        |)
        |SELECT *,
        |  CASE WHEN frac_dup_2gram_c > 200000 OR frac_top_2gram_c > 180000
        |       THEN 'drop' ELSE 'keep' END AS verdict
        |FROM s""".stripMargin,
    "decontaminate" ->
      s"""WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(${ngramsSql(toksSql, ContamN)})) AS g
        |  FROM documents
        |), ev AS (
        |  SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0
        |), hits AS (
        |  SELECT g.doc_id, count(*) AS n_hit
        |  FROM g JOIN ev ON g.g = ev.g
        |  WHERE g.doc_id % 97 <> 0
        |  GROUP BY 1
        |)
        |SELECT d.doc_id,
        |       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit_grams,
        |       CAST(CASE WHEN n_hit IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |         AS contaminated
        |FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
        |WHERE d.doc_id % 97 <> 0""".stripMargin,
    "pack_sequences" ->
      s"""WITH base AS (
        |  SELECT doc_id, lang,
        |         ${TF.portableHashSql("CAST(doc_id AS VARCHAR)", "shard")}
        |           % $PackShards AS shard,
        |         CAST(len($toksSql) AS BIGINT) AS n_tokens
        |  FROM documents
        |), o AS (
        |  SELECT *,
        |    CAST(coalesce(sum(n_tokens) OVER (
        |      PARTITION BY lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_off
        |  FROM base
        |)
        |SELECT doc_id, lang, shard, n_tokens, start_off,
        |       CAST(floor(CAST(start_off AS DOUBLE) / $PackLen) AS BIGINT)
        |         AS seq_bin
        |FROM o""".stripMargin,
    "global_shuffle" ->
      s"""WITH h AS (
        |  SELECT doc_id,
        |         ${TF.portableHashSql("CAST(doc_id AS VARCHAR)", ShuffleSeed)} AS h
        |  FROM documents
        |)
        |SELECT doc_id, h % $ShuffleShards AS shard,
        |       row_number() OVER (PARTITION BY h % $ShuffleShards
        |                          ORDER BY h, doc_id) AS pos
        |FROM h""".stripMargin,
    // Naive single-window formulation — the two-phase salted top-N
    // must reproduce it exactly.
    "source_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source
        |             ORDER BY n_chars DESC, doc_id ASC) AS keep_rank
        |  FROM documents
        |)
        |SELECT doc_id, source, n_chars, CAST(keep_rank AS BIGINT) AS keep_rank
        |FROM r WHERE keep_rank <= 10""".stripMargin,
    "embedding_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         list_max(list_transform(embedding,
        |           x -> abs(CAST(x AS DOUBLE)))) AS s
        |  FROM embeddings
        |)
        |SELECT vec_id,
        |       CAST(unnest(range(1, len(embedding)+1)) AS BIGINT) AS idx,
        |       CAST(CASE WHEN s = 0 THEN 0
        |            ELSE floor(CAST(unnest(embedding) AS DOUBLE) / s * 127 + 0.5)
        |            END AS BIGINT) AS q,
        |       CAST(floor(s * 1e6 + 0.5) AS BIGINT) AS scale_c
        |FROM s""".stripMargin,
    "vocab_topk" ->
      s"""SELECT tok AS token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
        |GROUP BY token ORDER BY tf DESC, token ASC LIMIT $VocabK""".stripMargin,
    "tf_idf" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS token FROM documents
        |), n AS (SELECT count(*) AS nd FROM documents),
        |dfs AS (SELECT token, count(DISTINCT doc_id) AS dfc FROM toks GROUP BY token),
        |tfs AS (SELECT doc_id, token, count(*) AS tfc FROM toks GROUP BY doc_id, token),
        |wts AS (
        |  SELECT t.doc_id, t.token,
        |    CAST(floor(t.tfc * ln(CAST(n.nd AS DOUBLE) / d.dfc) * 1000000.0) AS BIGINT) AS w_ppm
        |  FROM tfs t, dfs d, n WHERE t.token = d.token
        |)
        |SELECT doc_id, token, w_ppm, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY w_ppm DESC, token ASC) AS rn
        |  FROM wts) WHERE rn <= 3""".stripMargin,
    // Parallel unnest of (tokens, 1..len) zips token with its position;
    // list(tid ORDER BY pos) restores document order after the join.
    "tokenize_ids" ->
      s"""WITH vocab AS (
        |  SELECT tok AS token, row_number() OVER (ORDER BY tf DESC, token ASC) AS tid
        |  FROM (
        |    SELECT tok, count(*) AS tf
        |    FROM (SELECT unnest($toksSql) AS tok FROM documents)
        |    GROUP BY tok ORDER BY tf DESC, tok ASC LIMIT $TokenizerK)
        |), pos AS (
        |  SELECT doc_id, unnest(t) AS token,
        |         unnest(generate_series(1, len(t))) AS pos
        |  FROM (SELECT doc_id, $toksSql AS t FROM documents)
        |), ids AS (
        |  SELECT p.doc_id, p.pos, coalesce(v.tid, 0) AS tid
        |  FROM pos p LEFT JOIN vocab v ON p.token = v.token
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |       CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |       array_to_string(list(tid ORDER BY pos), ',') AS ids_str
        |FROM ids GROUP BY doc_id""".stripMargin,
    // DuckDB list slicing t[a:b] is 1-based inclusive and end-clipped,
    // exactly like Spark's slice(t, a, len) with b = a+len-1.
    "chunk_documents" ->
      s"""WITH t AS (
        |  SELECT doc_id, $toksSql AS toks, len($toksSql) AS n
        |  FROM documents
        |), st AS (
        |  SELECT doc_id, toks, unnest(range(0, n, $ChunkStride)) AS s
        |  FROM t WHERE n > 0
        |)
        |SELECT doc_id,
        |       s // $ChunkStride AS chunk_idx,
        |       CAST(s AS BIGINT) AS start_tok,
        |       CAST(len(toks[s + 1 : s + $ChunkWin]) AS BIGINT) AS chunk_len,
        |       array_to_string(toks[s + 1 : s + $ChunkWin], ' ') AS chunk_text
        |FROM st""".stripMargin,
    "domain_mix" ->
      s"""WITH w(lang, w_ppm) AS (VALUES $mixWeightsSql),
        |c AS (
        |  SELECT d.lang, count(*) AS n_d, min(w.w_ppm) AS w_ppm
        |  FROM documents d JOIN w ON d.lang = w.lang
        |  GROUP BY d.lang
        |), caps AS (
        |  SELECT min(CAST(floor(CAST(n_d * 1000000 AS DOUBLE) / w_ppm)
        |             AS BIGINT)) AS s_total
        |  FROM c
        |), t AS (
        |  SELECT lang, n_d,
        |         CAST(floor(CAST(w_ppm * s_total AS DOUBLE) / 1000000.0)
        |              AS BIGINT) AS t_d
        |  FROM c, caps
        |), r AS (
        |  SELECT lang,
        |         CAST(floor(CAST(t_d * 1000000 AS DOUBLE) / n_d)
        |              AS BIGINT) AS rate_ppm
        |  FROM t
        |)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN r ON d.lang = r.lang
        |WHERE ${TF.portableHashSql("CAST(d.doc_id AS VARCHAR)", "mix")}
        |        % 1000000 < r.rate_ppm""".stripMargin,
    // The dirty-slice derivation is mirrored verbatim; DuckDB's RE2
    // and Java regex agree on these patterns, and DuckDB needs the
    // explicit 'g' flag to match Spark's replace-all default.
    "pii_redact" ->
      s"""WITH dirty AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN
        |      text || ' contact user' || CAST(doc_id AS VARCHAR)
        |        || '@example.com or 555-'
        |        || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |        || ' id '
        |        || lpad(CAST(doc_id % 1000000000 AS VARCHAR), 9, '0')
        |    ELSE text END AS dirty
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(dirty,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(dirty, '\\d{3}-\\d{3}-\\d{4}'))
        |    AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(dirty, '\\b\\d{9}\\b')) AS BIGINT)
        |    AS n_ids,
        |  regexp_replace(regexp_replace(regexp_replace(dirty,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\\d{3}-\\d{3}-\\d{4}', '<PHONE>', 'g'),
        |    '\\b\\d{9}\\b', '<ID>', 'g') AS redacted
        |FROM dirty""".stripMargin,
    "oov_rate" ->
      s"""WITH g AS (
        |  SELECT doc_id, unnest(${ngramsSql(toksSql, 3)}) AS g
        |  FROM documents
        |), top AS (
        |  SELECT g FROM (
        |    SELECT g, count(*) AS cnt FROM g
        |    GROUP BY 1 ORDER BY cnt DESC, g ASC LIMIT $OovTopK)
        |), n AS (
        |  SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1
        |), h AS (
        |  SELECT g.doc_id, count(*) AS n_hit
        |  FROM g JOIN top ON g.g = top.g GROUP BY 1
        |)
        |SELECT n.doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(floor(CAST(n_grams - coalesce(n_hit, 0) AS DOUBLE) * 1e6
        |       / n_grams) AS BIGINT) AS oov_ppm
        |FROM n LEFT JOIN h ON n.doc_id = h.doc_id""".stripMargin,
    // The oracle replays the NAIVE single global window — the engine's
    // two-level band decomposition must hash-equal it exactly.
    "token_budget_select" ->
      s"""WITH t AS (
        |  SELECT doc_id, n_chars, len($toksSql) AS n_tok FROM documents
        |), c AS (
        |  SELECT doc_id, n_tok,
        |    coalesce(sum(n_tok) OVER (
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM t
        |)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |       CAST(cum_before AS BIGINT) AS cum_before
        |FROM c WHERE cum_before < $TokenBudget""".stripMargin,
    "weighted_sample" ->
      s"""WITH h AS (
        |  SELECT doc_id, n_chars AS w,
        |    ${TF.portableHashSql("CAST(doc_id AS VARCHAR)", "wsample")}
        |      % 1073741824 AS h
        |  FROM documents
        |)
        |SELECT doc_id, w,
        |  CAST(floor(CAST(w * 1073741824 AS DOUBLE) / (h + 1)) AS BIGINT)
        |    AS priority
        |FROM h
        |ORDER BY priority DESC, doc_id
        |LIMIT $SampleK""".stripMargin
  )
}
