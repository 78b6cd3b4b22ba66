package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{Components, MinHashLSH, TextFunctions => TF}

/** Oracle-checked queries for the training-data text pipeline over the
  * `documents` table: exact + MinHash-LSH near-dup dedup, n-gram
  * Jaccard, text statistics / language heuristic / quality scoring,
  * document fingerprinting (rolling hash, md5, SimHash), and the
  * multimodal binary-payload plumbing.
  *
  * The DuckDB oracles replay the IDENTICAL pipelines (same md5-derived
  * hashes, same fold order), so even the LSH candidate sets match
  * exactly. Long oracle SQL is program-generated next to the Spark
  * expression it mirrors.
  */
object TextQueries {

  private[queries] val Perms = 16
  private[queries] val BandRows = 4

  /** The ONE operating point of `minhash_dedup_auto` — the query's
    * threshold literal and the oracle's banding + ppm cutoff are all
    * derived from this single val, so editing it cannot break the
    * "oracle generated from the same rule" guarantee. */
  private val MinhashAutoThreshold = 0.8

  /** SimHash verification radius (bits). The band count is derived
    * from it ([[TF.simhashBandingFor]]), never pinned separately —
    * a pinned count below d+1 would silently lose true pairs. */
  private val SimhashHammingMax = 2
  private val Stop = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Exact dedup: whitespace/case-normalized text, keeper = min id. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), norm.as("norm"))
      .groupBy(col("norm"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"),
        substring(md5(col("norm")), 1, 16).as("fp"))
  }

  /** MinHash + banded LSH near-duplicate pairs, exact-Jaccard verified. */
  def minhashDedup(spark: SparkSession, dir: String): DataFrame =
    MinHashLSH.nearDuplicates(Tables.documents(spark, dir), "doc_id", "text",
      ngram = 3, perms = Perms, bandRows = BandRows, threshold = 0.5)

  /** [[minhashDedup]] at the STRICT t = 0.8 operating point with the
    * banding chosen by the ENGINE ([[MinHashLSH.bandingFor]] — the
    * LSH S-curve rule): at 0.8 the 16-perm budget narrows from the
    * production 4×4 to 2 bands × 8 rows, trading S-curve softness
    * near the threshold for a 2× smaller false-candidate integral —
    * candidates ARE the pair-work budget at 100 TB. The oracle is
    * GENERATED from the same rule (banding + threshold), so query
    * and oracle cannot drift and the row is valid at every operating
    * point; the rule reproducing the hand-pinned production banding
    * at t = 0.5 is spec-pinned (`MinHashSpec`), not a registered
    * duplicate of `minhash_dedup`. */
  def minhashDedupAuto(spark: SparkSession, dir: String): DataFrame =
    MinHashLSH.nearDuplicatesAuto(Tables.documents(spark, dir), "doc_id",
      "text", ngram = 3, perms = Perms, threshold = MinhashAutoThreshold)

  /** INCREMENTAL [[minhashDedup]] — merge-equals-recompute for the
    * MinHash band index ([[MinHashLSH.incrementalNearDuplicates]]):
    * history (doc_id % 10 < 8) keeps its stored pairs and band tuples;
    * the delta is shingled/banded alone and only delta-involving
    * candidates are verified. Shares `minhash_dedup`'s oracle
    * VERBATIM — the hash proves absorbing the delta loses and invents
    * no pair. */
  def minhashDedupIncr(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    MinHashLSH.incrementalNearDuplicates(
      docs.filter(col("doc_id") % 10 < 8),
      docs.filter(col("doc_id") % 10 >= 8),
      "doc_id", "text", ngram = 3, perms = Perms, bandRows = BandRows,
      threshold = 0.5,
      disjointIds = true) // proven by the % 10 split
  }

  /** Near-dup components: the MinHash pair graph closed transitively
    * ([[graft.text.Components]]) — (doc_id, comp) where comp = min
    * doc_id of the cluster, i.e. the canonical document to KEEP. */
  def dedupComponents(spark: SparkSession, dir: String): DataFrame =
    Components.connected(minhashDedup(spark, dir), "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("comp"))

  /** Canonical-representative selection — the step AFTER near-dup
    * clustering in a real dedup pipeline: within each connected
    * component keep the best document (longest text, tie-break lowest
    * id) and account for what gets dropped. One extra aggregate over
    * the component labels (the components output is the dup subset
    * only — tiny next to the corpus — so the doc-metadata join is the
    * only corpus-touching step, and it's key-equi, one shuffle). */
  def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    val comps = dedupComponents(spark, dir) // (doc_id, comp)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    comps.join(docs, "doc_id")
      .groupBy(col("comp"))
      .agg(
        max_by(col("doc_id"),
          struct(col("n_chars"), (col("doc_id") * -1).as("neg_id"))).as("keep_id"),
        count(lit(1)).as("n_members"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .select(col("comp"), col("keep_id"), col("n_members"), col("total_chars"))
  }

  /** Document-frequency cap for the n-gram inverted index: a shingle
    * appearing in d documents emits d²/2 candidate rows from the
    * self-join, so one stop-shingle ("of the and"-grade) turns the
    * index quadratic at corpus scale. Shingles past the cap are
    * corpus-generic by definition and carry no near-dup signal;
    * dropping them BEFORE the join bounds its worst case at DfCap²
    * rows per shingle. */
  private val DfCap = 50

  /** Within-language n-gram Jaccard over the df-capped shingle space
    * (word 3-grams with df > [[DfCap]] removed — the IR stopword-
    * removal move): candidate pairs emerge only from shared informative
    * shingles, and the score is `|A'∩B'| / |A'∪B'|` over the capped
    * sets, so the metric is self-consistent and the inverted-index
    * self-join is bounded. (A first cut verified candidates against
    * the FULL shingle sets instead — exact classic Jaccard, but the
    * per-candidate `array_intersect` costs O(|A|+|B|) where the
    * one-phase count pays O(shared), and it benched 6× slower. The
    * capped-space metric keeps the one-phase shape.) */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val arrs = Tables.spread(docs).select(col("doc_id"), col("lang"),
      call_function("graft_shingles", TF.tokens(col("text")), lit(3)).as("gs"))
    val sh = arrs.select(col("doc_id"), col("lang"), explode(col("gs")).as("g"))
    // The hot list is tiny by construction (only corpus-generic
    // shingles qualify) — broadcast anti-join, one aggregation pass.
    val hot = sh.groupBy(col("lang"), col("g"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > DfCap)
      .select(col("lang"), col("g"))
    // ONE materialized capped-shingle stream: the per-doc size
    // aggregate and BOTH self-join sides consume the tokenize +
    // shingle + explode + anti-join pipeline — the expensive part —
    // so they ride a single explicit (lang, g) exchange, reused at
    // runtime (the span_dedup pattern; before this the pipeline ran
    // once per consumer: three corpus tokenizations beyond the df
    // aggregate's own). (lang, g) is exactly the self-join key, so
    // the join adds NO further exchange; pruning keeps all three
    // columns in the counts branch too (doc_id is its grouping key,
    // lang/g are the partitioning expressions), so the subtrees stay
    // canonically equal.
    val shC = sh.join(broadcast(hot), Seq("lang", "g"), "left_anti")
      .repartition(col("lang"), col("g"))
    // Per-doc sizes over the SAME capped space the intersection counts.
    val counts = shC.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = shC.select(col("doc_id").as("doc_a"), col("lang"), col("g"))
    val b = shC.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("g").as("g_b"))
    a.join(b, col("g") === col("g_b") && col("lang") === col("lang_b") &&
        col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        floor(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")) * 1e6 + 0.5d).as("jaccard_c"))
      .filter(col("jaccard_c") >= 200000L)
  }

  /** Token counts, punctuation/stopword stats, quality score, and a
    * marker-word language heuristic. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = TF.tokens(col("text"))
    val nTokens = size(toks).cast("long")
    def hits(words: Seq[String]): Column =
      size(filter(toks, t => t.isin(words.map(lit): _*))).cast("long")
    val nStop = hits(Stop)
    val stopRatio = nStop.cast("double") / nTokens.cast("double")
    val quality = least(nTokens, lit(400L)).cast("double") / 400d * 0.5d +
      stopRatio * 0.5d
    val sEn = hits(Seq("the", "a", "is"))
    val sEs = hits(Seq("el", "la", "los", "que"))
    val sDe = hits(Seq("der", "die", "das", "und"))
    val sFr = hits(Seq("le", "les", "des", "et"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      nTokens.as("n_tokens"),
      TF.bpeTokenCount(col("text")).as("n_tokens_bpe"),
      length(col("text")).cast("long").as("n_chars_calc"),
      size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0)))
        .cast("long").as("n_punct"),
      nStop.as("n_stop"),
      floor(stopRatio * 1e6 + 0.5d).as("stop_ratio_c"),
      floor(quality * 1e6 + 0.5d).as("quality_c"),
      when(sEn >= sEs && sEn >= sDe && sEn >= sFr, lit("en"))
        .when(sEs >= sDe && sEs >= sFr, lit("es"))
        .when(sDe >= sFr, lit("de"))
        .otherwise(lit("fr")).as("lang_guess"))
  }

  /** Document fingerprints: char-level rolling hash, md5 prefix, and a
    * 16-bit SimHash over the token stream. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir)).select(
      col("doc_id"),
      TF.rollingFingerprint(col("text")).as("fp_rolling"),
      substring(md5(col("text")), 1, 16).as("fp_md5"),
      TF.simHash(TF.tokens(col("text")), 16).as("simhash16"))

  /** Span width for [[spanDedup]] — wide enough that chance repeats
    * across the synthetic small-vocabulary corpus are rare, narrow
    * enough that real duplicated passages are caught. */
  private[queries] val SpanK = 8

  /** Exact substring-span dedup (the Lee et al. practical form the
    * doc-level MinHash family doesn't cover): find every token
    * position whose k-gram repeats in ANOTHER document, then merge
    * overlapping/adjacent hits into maximal spans — the regions a
    * training-data pipeline would cut. Emits one row per maximal span
    * (doc_id, span_start, span_end, span_tokens; 1-based inclusive
    * token indices).
    *
    * Relational shape, no iteration: gram hash → one groupBy to find
    * cross-doc repeats → join back (the probe side is the gram
    * stream; AQE handles the usually-small build side) → per-doc
    * gaps-and-islands (lag + running sum) to union intervals. Equal
    * gram length makes interval union exact with only start
    * positions: a next start within K of the previous start overlaps
    * or touches, so islands break exactly when `pos - lag(pos) > K`.
    *
    * 100 TB story: three key-partitioned shuffles (gram hash, join
    * back, doc window) over the gram stream — each linear, none
    * quadratic; the suffix-array original is a single-machine
    * construction this replaces with group-and-window primitives. */
  def spanDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.SpanIndex
    // ONE materialized gram stream: the index aggregate (summarize)
    // and the join-back (spans) both consume the gram projection —
    // tokenize + n-gram + per-gram md5, the expensive part — so they
    // must ride a single explicit gh exchange, reused at runtime.
    // The `pos >= 1` pin (true by construction — positions are
    // 1-based — but unprovable) sits on the SHARED frame, not the
    // aggregate branch: a branch-side filter would push below the
    // exchange on that branch alone and de-synchronize the subtrees;
    // on the shared frame it pushes below identically everywhere and
    // keeps `pos` in every copy's column set. Plan-audited.
    val grams = SpanIndex.grams(
      Tables.spread(Tables.documents(spark, dir)), SpanK)
      .filter(col("pos") >= 1)
      .repartition(col("gh"))
    val dup = SpanIndex.dupGrams(SpanIndex.summarize(grams))
    SpanIndex.spans(grams, dup, SpanK)
  }

  /** INCREMENTAL [[spanDedup]] — the merge-equals-recompute proof for
    * the cross-document gram index ([[graft.text.SpanIndex]]): the
    * corpus is split into a "history" batch (doc_id % 10 < 8) and a
    * "delta" batch (the rest, the [[graft.etl.IncrementalAgg]]
    * convention), each batch is indexed SEPARATELY (per-gram nd/doc0
    * summaries — the |delta|-sized work of a real load cycle), the
    * summaries merge by the index algebra (sum/min), and spans are
    * marked against the MERGED index. The registry shares
    * `span_dedup`'s oracle verbatim: a green hash is a machine proof
    * that absorbing a delta by summary-merge loses and invents no
    * duplicated span. (The companion |delta|-sized re-marking
    * refinement — delta docs ∪ affectedHistoryDocs — is pinned by
    * SpanIndexSpec.) */
  def spanDedupIncr(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.SpanIndex
    val docs = Tables.spread(Tables.documents(spark, dir))
    val hist = SpanIndex.summarize(
      SpanIndex.grams(docs.filter(col("doc_id") % 10 < 8), SpanK))
    val delta = SpanIndex.summarize(
      SpanIndex.grams(docs.filter(col("doc_id") % 10 >= 8), SpanK))
    val merged = SpanIndex.merge(Seq(hist, delta))
    SpanIndex.spans(SpanIndex.grams(docs, SpanK),
      SpanIndex.dupGrams(merged), SpanK)
  }

  /** The removal half of [[spanDedup]]: re-emit every document with
    * its repeated spans CUT — the actual training-corpus transform
    * (mark → cut). Tokens keep their original order; a doc with no
    * spans passes through verbatim. The span join is per-doc (spans
    * are few and co-keyed with the token stream on doc_id), then an
    * anti range-filter keeps tokens outside every span — no window
    * over the corpus, one doc_id-partitioned shuffle beyond
    * [[spanDedup]]'s own. */
  def spanDedupCut(spark: SparkSession, dir: String): DataFrame = {
    // Spans collapse to ONE array row per affected doc, so the cut is
    // a single pass over a single tokenization: the former
    // covered-positions LEFT ANTI formulation tokenized the corpus
    // TWICE (anti-join probe + covered derivation) and shuffled the
    // full token stream through two (doc_id, pos) exchanges; here the
    // token stream is produced once, the span-array join is doc-keyed
    // (broadcast-sized at bench SFs, |docs-with-spans| at scale), and
    // "kept" = not inside ANY span — exactly the anti-join's
    // membership, row for row. A doc with no spans joins null and
    // keeps everything (the coalesce).
    val spans = spanDedup(spark, dir)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    val toks = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        posexplode(TF.tokens(col("text"))).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("tok"))
    toks.join(spans, Seq("doc_id"), "left")
      .filter(!coalesce(exists(col("__spans"),
        s => col("pos") >= s.getField("span_start") &&
          col("pos") <= s.getField("span_end")), lit(false)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("cleaned_text"))
  }

  /** SimHash near-dup pairs: 60-bit signatures, banded LSH candidates,
    * exact Hamming verify <= [[SimhashHammingMax]]. Never all-pairs.
    *
    * The band count is ENGINE-DERIVED from the verification radius
    * ([[TF.simhashBandingFor]] — the Manku pigeonhole minimum d+1,
    * here 3 bands of 20 bits; was a hand-pinned 4×15). The final pair
    * set is provably banding-INVARIANT for any count above d: every
    * true pair collides in some band either way, and the exact verify
    * drops every false candidate — which the oracle machine-checks
    * each round, because it deliberately still replays the OLD 4×15
    * banding: the hash can only match if both bandings verify to the
    * identical pair set. The engine's 3×20 is the cheaper plan (3n
    * band tuples vs 4n, and 2⁵× rarer false band collisions). */
  def simhashDedup(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(simhashSignatures(
      Tables.spread(Tables.documents(spark, dir))))

  /** 60-bit SimHash signatures (doc_id, s) — the per-doc state a
    * dedup cycle stores alongside its band index. */
  private def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TF.simHash(TF.tokens(col("text")), 60).as("s"))

  /** Engine-banded (doc_id, b, bv) tuples from signatures — the
    * stored band index of a SimHash dedup cycle. */
  private def simhashBandTuples(sh: DataFrame): DataFrame = {
    val banding = TF.simhashBandingFor(60, SimhashHammingMax)
    val bandArr = array(banding.zipWithIndex.map { case ((shift, width), b) =>
      struct(lit(b).as("b"),
        shiftright(col("s"), shift)
          .bitwiseAND(lit((1L << width) - 1)).as("bv"))
    }: _*)
    sh.select(col("doc_id"), explode(bandArr).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.bv").as("bv"))
  }

  /** Exact Hamming verify of (doc_a, doc_b) candidates against the
    * signatures frame; emits the verified distance. */
  private def simhashVerify(cand: DataFrame, sh: DataFrame): DataFrame =
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sa ^ sb)").cast("long").as("hamming"))
      .filter(col("hamming") <= SimhashHammingMax)

  /** Full band → candidate → verify pipeline over a signatures frame. */
  private def simhashPairs(sh: DataFrame): DataFrame =
    simhashVerify(simhashCandidates(simhashProj(simhashBandTuples(sh))), sh)

  /** The canonical (b, bv, doc) projection the candidate machinery
    * partitions on — [[simhashDedupIncr]] builds every candidate
    * class from this exact projection so the band exchanges unify at
    * runtime (ReusedExchange), like [[MinHashLSH]]'s. */
  private def simhashProj(bands: DataFrame): DataFrame =
    bands.select(col("b"), col("bv"), col("doc_id").as("doc"))

  /** Distinct candidate pairs (doc_a < doc_b) sharing a band value.
    * Skew-routed band self-join (graft.etl.Skew.selfPairsByBucket):
    * a hot band value (width engine-derived from the radius) —
    * boilerplate all near-identical docs share — would otherwise
    * serialize its quadratic candidate fan-out in one task. */
  private def simhashCandidates(proj: DataFrame): DataFrame =
    graft.etl.Skew.selfPairsByBucket(proj, Seq("b", "bv"), Seq("doc"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()

  /** INCREMENTAL [[simhashDedup]] — merge-equals-recompute for the
    * SimHash band index: the [[MinHashLSH.incrementalNearDuplicates]]
    * cycle applied to the Hamming family, completing the incremental
    * surface (minhash/span/embedding families already have one). The
    * stored state of a cycle is its (doc_id, b, bv) band index plus
    * its verified pair set; absorbing a doc-atomic delta costs:
    *
    *  1. tokenize/sign/band the DELTA only — |delta| work;
    *  2. join the delta's band tuples against stored ∪ delta tuples —
    *     exactly the candidate pairs a full recompute would involve a
    *     delta doc in (band values are per-document);
    *  3. Hamming-verify those candidates and union the PRIOR cycle's
    *     pairs, which cannot change (a within-history pair shares no
    *     doc with the delta).
    *
    * History is never re-hashed and never re-self-joined. The
    * asymmetric candidate join keys on (b, bv) like the full path's
    * skew-routed self-join, but a hot band value fans out only
    * |delta_hot| × |all_hot| — LINEAR in the delta, so the quadratic
    * hot-bucket hazard the full path routes around cannot arise while
    * deltas stay a bounded fraction of the corpus; a deployment with
    * a small delta broadcasts its band tuples outright. Shares
    * `simhash_dedup`'s oracle VERBATIM — the hash proves absorbing
    * the delta loses and invents no pair. Here the prior pairs/bands
    * are recomputed from the history split for the proof; a
    * deployment reads both back from the stored cycle tables. Like
    * [[MinHashLSH.incrementalNearDuplicates]], the recomputation pays
    * for history ONCE: prior candidates come from the same band
    * frames the delta absorbs against; the delta-vs-history class
    * repartitions both (b, bv, doc) projections exactly as their
    * self-join frames are partitioned inside selfPairsByBucket, so
    * of the four band exchanges only one per corpus side
    * materializes (the rest are runtime ReusedExchange; plan-
    * audited); and ONE Hamming verify runs over the unioned
    * candidate set, deduped across the hist-hist / delta-hist /
    * delta-delta classes — row-identical to verifying each class
    * alone (the dedup is a no-op here, where the %10 split keeps the
    * id spaces disjoint; see [[simhashIncrementalPairs]] for the
    * overlap contract). */
  def simhashDedupIncr(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    simhashIncrementalPairs(
      docs.filter(col("doc_id") % 10 < 8),
      docs.filter(col("doc_id") % 10 >= 8),
      disjointIds = true) // proven by the % 10 split
  }

  /** The merge cycle of [[simhashDedupIncr]] over explicit (doc_id,
    * text) history/delta frames — exposed for the overlap-guard spec;
    * the registry row is the %10-split instance above. Id spaces MAY
    * overlap (a doc re-ingested in the delta, same text — an UPDATED
    * text needs a delete cycle first, out of scope here): the
    * delta-hist class filters `doc =!= hdoc` so a shared id cannot
    * emit a hamming-0 self-pair, and the verify signatures and the
    * cross-class candidate union are deduped so the shared id cannot
    * multiply verify rows. A caller with a disjointness PROOF (the
    * registry's %10 split) passes `disjointIds = true` to skip the
    * two dedup exchanges; the self-pair filter is free and stays. */
  private[graft] def simhashIncrementalPairs(histDocs: DataFrame,
      deltaDocs: DataFrame, disjointIds: Boolean = false): DataFrame = {
    val histSh = simhashSignatures(histDocs)
    val deltaSh = simhashSignatures(deltaDocs)
    val histProj = simhashProj(simhashBandTuples(histSh))
    val deltaProj = simhashProj(simhashBandTuples(deltaSh))
    val prior = simhashCandidates(histProj)       // hist-hist
    val freshDelta = simhashCandidates(deltaProj) // delta-delta
    val freshHist = deltaProj.repartition(col("b"), col("bv"))
      .join(histProj.repartition(col("b"), col("bv"))
        .withColumnRenamed("doc", "hdoc"), Seq("b", "bv"))
      // Guard against overlapping id spaces (a doc re-ingested in the
      // delta): a shared id would emit a hamming-0 (a,a) self-pair and
      // duplicate verify rows, diverging from the full-recompute oracle.
      .filter(col("doc") =!= col("hdoc"))
      .select(least(col("doc"), col("hdoc")).as("doc_a"),
        greatest(col("doc"), col("hdoc")).as("doc_b"))
      .distinct()
    // Candidate union deduped across classes (a shared id can surface
    // the same pair from two classes) and verify signatures deduped by
    // id — both skipped under the caller's disjointness proof, where
    // they would be semantic no-ops costing real exchanges (the
    // signature one corpus-sized).
    val cands = prior.unionByName(freshHist).unionByName(freshDelta)
    val sh = histSh.unionByName(deltaSh)
    simhashVerify(
      if (disjointIds) cands else cands.distinct(),
      if (disjointIds) sh else sh.dropDuplicates("doc_id"))
  }

  /** Corpus profiling per language: doc counts, exact distinct
    * sources, exact interpolated length percentiles, token totals —
    * the summary a training-data pipeline recomputes per snapshot.
    * (At 100 TB the approx forms — approx_count_distinct /
    * approx_percentile — replace the exact ones; exact is used here
    * because it is oracle-checkable.) */
  def corpusProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        EtlQueries.cents(expr("percentile(n_chars, 0.5)")).as("median_chars_c"),
        EtlQueries.cents(expr("percentile(n_chars, 0.9)")).as("p90_chars_c"),
        sum(size(TF.tokens(col("text"))).cast("long")).as("total_tokens"))

  /** Deterministic stratified sampling — the reproducible train/eval
    * split every training-data pipeline needs: the gate is a pure
    * function of the ROW KEY (portable md5-derived hash mod 1000
    * against a per-language permille rate), so the same doc lands on
    * the same side of the split on every run, on any cluster, at any
    * parallelism — unlike `df.sample`, whose output depends on
    * partitioning and seed plumbing. Per-language rates implement
    * stratification (downsample the dominant language, keep the
    * tail); unlisted languages fall to the default rate. Embarrassingly
    * parallel: a filter, no shuffle. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rates = Map("en" -> 250, "de" -> 500)  // permille, others 750
    val gate = pmod(TF.portableHash(col("doc_id").cast("string"), "split"),
      lit(1000L))
    val rate = rates.foldLeft(lit(750): org.apache.spark.sql.Column) {
      case (acc, (l, r)) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .filter(gate < rate)
      .select(col("doc_id"), col("lang"), gate.as("gate"))
  }

  /** Multimodal plumbing: text treated as an opaque binary payload with
    * typed metadata — byte length, content hash, head bytes. (The real
    * image/audio decode would run over exactly this shape; here the
    * "decode" is the deterministic byte-level feature extraction.) */
  def multimodalPayload(spark: SparkSession, dir: String): DataFrame = {
    val bin = encode(col("text"), "UTF-8")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      sha2(bin, 256).as("payload_sha"),
      substring(hex(bin), 1, 16).as("head_hex"))
  }

  /** Percentile-threshold quality gate — the corpus-curation step that
    * drops the shortest X% of documents PER LANGUAGE (a global cutoff
    * would gut compact-script languages). The cutoff is defined by
    * RANK, not value interpolation: `percent_rank() >= 0.1` keeps a
    * document iff at least 10% of its language's corpus ranks strictly
    * below it — tie-stable and bit-identical across engines (the
    * interpolated `percentile_cont` cutoff is not, since boundary
    * inclusion then hinges on a float equality).
    *
    * Scale shape: one hash exchange on `lang` + a per-language sort.
    * Language partitions are few and huge — the real-scale variant
    * computes approximate per-lang cutoffs first (approx_percentile
    * over a map-side-combining agg, no sort) and gates by value; the
    * rank formulation here is the exact, oracle-checkable
    * specification of the same semantics. */
  def qualityPercentile(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_chars"))
    Tables.documents(spark, dir)
      .withColumn("__pr", percent_rank().over(w))
      .filter(col("__pr") >= 0.1)
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  /** Leakage-safe train/val/test assignment ([[graft.text.Splits]]):
    * every document splits by the portable hash of its near-dup
    * cluster canonical (its connected-component label; singletons
    * hash their own id), so no near-duplicate pair ever straddles a
    * split boundary — the property that separates measuring
    * generalization from measuring memorization. Composes the REAL
    * minhash → LSH → components pipeline; the oracle replays all of
    * it (the recursive-CTE closure) plus the bucket arithmetic. */
  def trainSplit(spark: SparkSession, dir: String): DataFrame =
    graft.text.Splits.leakageSafeSplit(
      Tables.documents(spark, dir).select(col("doc_id")),
      "doc_id",
      dedupComponents(spark, dir))
      .select(col("doc_id"), col("split"))

  /** Fuzzy decontamination — the near-match complement of the exact
    * n-gram [[graft.queries.PipelineQueries.decontaminate]]: training
    * docs that are NEAR-duplicates (Jaccard >= 0.5 on 3-gram
    * shingles) of any held-out eval doc, found by the asymmetric LSH
    * match [[graft.text.MinHashLSH.matchesAgainst]] — eval bands and
    * shingle arrays broadcast, the corpus never shuffles. The eval
    * slice is `doc_id % 7` (not `decontaminate`'s % 97): chosen so it
    * SPLITS several of the testdata's planted near-dup clusters and
    * the query exercises real matches at every sf.
    * Output: one row per contaminated training doc with its match
    * count and best Jaccard (ppm). */
  def decontaminateFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val evalSet = docs.filter(col("doc_id") % 7 === 0)
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    MinHashLSH.matchesAgainst(train, evalSet, "doc_id", "text",
        ngram = 3, perms = Perms, bandRows = BandRows, threshold = 0.5)
      .groupBy(col("corpus_id"))
      .agg(count(lit(1)).as("n_eval_matches"),
        max(col("jaccard_c")).as("max_jaccard_c"))
      .select(col("corpus_id").as("doc_id"), col("n_eval_matches"),
        col("max_jaccard_c"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontaminate_fuzzy" -> (decontaminateFuzzy _),
    "train_split"        -> (trainSplit _),
    "quality_percentile" -> (qualityPercentile _),
    "exact_dedup"        -> (exactDedup _),
    "minhash_dedup"      -> (minhashDedup _),
    "minhash_dedup_auto" -> (minhashDedupAuto _),
    "minhash_dedup_incr" -> (minhashDedupIncr _),
    "ngram_jaccard"      -> (ngramJaccard _),
    "text_stats"         -> (textStats _),
    "doc_fingerprint"    -> (docFingerprint _),
    "span_dedup"         -> (spanDedup _),
    "span_dedup_incr"    -> (spanDedupIncr _),
    "span_dedup_cut"     -> (spanDedupCut _),
    "simhash_dedup"      -> (simhashDedup _),
    "simhash_dedup_incr" -> (simhashDedupIncr _),
    "corpus_profile"     -> (corpusProfile _),
    "multimodal_payload" -> (multimodalPayload _),
    "dedup_components"   -> (dedupComponents _),
    "dedup_canonical"    -> (dedupCanonical _),
    "stratified_sample"  -> (stratifiedSample _)
  )

  // ---------------------------------------------------------------- oracles

  private def hashSql(e: String, salt: String) = TF.portableHashSql(e, salt)

  private val toksSql = "string_split_regex(text, '\\s+')"

  /** DuckDB list of word n-grams over token list expression `t`. */
  private def ngramsSql(t: String, n: Int) =
    s"[array_to_string($t[i:i+${n - 1}], ' ') for i in generate_series(1, len($t)-${n - 1})]"

  /** Shared CTE chain for the span-dedup pair, ending in
    * `isl(doc_id, pos, island)` — the marked gram positions grouped
    * into maximal islands (the SQL mirror of [[spanDedup]]'s
    * gaps-and-islands). */
  private lazy val spanCtesSql =
    s"""toks AS (
      |  SELECT doc_id, $toksSql AS t FROM documents
      |), g0 AS (
      |  SELECT doc_id, ${ngramsSql("t", SpanK)} AS gs
      |  FROM toks WHERE len(t) >= $SpanK
      |), grams AS (
      |  SELECT doc_id, unnest(generate_series(1, len(gs))) AS pos,
      |         unnest([${hashSql("x", "span")} for x in gs]) AS gh
      |  FROM g0
      |), dup AS (
      |  SELECT gh FROM grams GROUP BY gh
      |  HAVING count(DISTINCT doc_id) >= 2
      |), marked AS (
      |  SELECT doc_id, pos FROM grams JOIN dup USING (gh)
      |), brks AS (
      |  SELECT doc_id, pos,
      |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
      |                ORDER BY pos) > $SpanK THEN 1 ELSE 0 END AS brk
      |  FROM marked
      |), isl AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
      |           ROWS UNBOUNDED PRECEDING) AS island
      |  FROM brks
      |)""".stripMargin

  /** CTE chain ending in `pairs(doc_a, doc_b, jaccard_c)` — the full
    * MinHash-LSH replay, parameterized over the banding and the
    * verification threshold so the engine-banded row's oracle is
    * GENERATED from the same [[MinHashLSH.bandingFor]] choice as the
    * query (they cannot drift — no pinned-oracle scale guard needed,
    * the rule reads no corpus statistic). */
  private def minhashPairsCtesFor(bandRows: Int,
      thrMillionths: Long): String = {
    val sigCols = (0 until Perms)
      .map(p => s"min(${TF.portableHashHexSql("shingle", s"p$p")}) AS sig$p")
      .mkString(",\n    ")
    val bandExprs = (0 until Perms / bandRows).map { b =>
      val slice = (b * bandRows until (b + 1) * bandRows).map(p => s"sig$p")
      s"md5(concat_ws('_', $b, ${slice.mkString(", ")}))"
    }.mkString(",\n      ")
    s"""WITH toks AS (
      |  SELECT doc_id, $toksSql AS t FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(${ngramsSql("t", 3)})) AS shingle
      |  FROM toks
      |), sig AS (
      |  SELECT doc_id,
      |    $sigCols
      |  FROM sh GROUP BY doc_id
      |), band AS (
      |  SELECT doc_id, unnest([
      |      $bandExprs]) AS band_key
      |  FROM sig
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM band a JOIN band b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
      |), cnt AS (
      |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS inter
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.doc_a
      |  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT i.doc_a, i.doc_b,
      |         CAST(floor(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) * 1e6 + 0.5)
      |              AS BIGINT) AS jaccard_c
      |  FROM inter i
      |  JOIN cnt ca ON i.doc_a = ca.doc_id
      |  JOIN cnt cb ON i.doc_b = cb.doc_id
      |  WHERE CAST(floor(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) * 1e6 + 0.5)
      |             AS BIGINT) >= $thrMillionths
      |)""".stripMargin
  }

  /** The production operating point: pinned 4-row banding, t = 0.5.
    * `private[queries]`: [[StreamingQueries]] derives the streamed
    * probe's oracle from the same CTEs (cross-boundary projection of
    * the identical pair set), keeping one source of truth. */
  private[queries] val minhashPairsCtes: String =
    minhashPairsCtesFor(BandRows, 500000L)

  private val minhashOracle: String =
    minhashPairsCtes + "\nSELECT doc_a, doc_b, jaccard_c FROM pairs"

  /** Oracle of the ENGINE-BANDED strict row: banding generated from
    * the same rule as the query — [[MinHashLSH.bandingFor]] at
    * [[MinhashAutoThreshold]], which narrows the 16-perm budget to
    * 2 bands × 8 rows at 0.8. Both the banding and the ppm cutoff
    * derive from the shared val. */
  private val minhashAutoOracle: String = {
    val (_, rows) = MinHashLSH.bandingFor(Perms, MinhashAutoThreshold)
    minhashPairsCtesFor(rows, math.round(MinhashAutoThreshold * 1e6)) +
      "\nSELECT doc_a, doc_b, jaccard_c FROM pairs"
  }

  /** DuckDB replay of the asymmetric eval-vs-train LSH match: the
    * SAME signature/band pipeline as [[minhashPairsCtes]], but
    * candidates pair a training doc with an eval doc instead of
    * self-joining — signatures are per-doc, so computing them over
    * the whole corpus and splitting at the candidate step is
    * identical to the engine's split-first order. */
  private val decontamFuzzyOracle: String = {
    val sigCols = (0 until Perms)
      .map(p => s"min(${TF.portableHashHexSql("shingle", s"p$p")}) AS sig$p")
      .mkString(",\n    ")
    val bandExprs = (0 until Perms / BandRows).map { b =>
      val slice = (b * BandRows until (b + 1) * BandRows).map(p => s"sig$p")
      s"md5(concat_ws('_', $b, ${slice.mkString(", ")}))"
    }.mkString(",\n      ")
    s"""WITH toks AS (
      |  SELECT doc_id, $toksSql AS t FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(list_distinct(${ngramsSql("t", 3)})) AS shingle
      |  FROM toks
      |), sig AS (
      |  SELECT doc_id,
      |    $sigCols
      |  FROM sh GROUP BY doc_id
      |), band AS (
      |  SELECT doc_id, unnest([
      |      $bandExprs]) AS band_key
      |  FROM sig
      |), cand AS (
      |  SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
      |  FROM band t JOIN band e ON t.band_key = e.band_key
      |  WHERE t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
      |), cnt AS (
      |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT c.train_id, c.eval_id, count(*) AS inter
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.train_id
      |  JOIN sh b ON b.doc_id = c.eval_id AND b.shingle = a.shingle
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT i.train_id, i.eval_id,
      |         CAST(floor(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) * 1e6 + 0.5)
      |              AS BIGINT) AS jaccard_c
      |  FROM inter i
      |  JOIN cnt ca ON i.train_id = ca.doc_id
      |  JOIN cnt cb ON i.eval_id = cb.doc_id
      |  WHERE CAST(floor(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) * 1e6 + 0.5)
      |             AS BIGINT) >= 500000
      |)
      |SELECT train_id AS doc_id, count(*) AS n_eval_matches,
      |       max(jaccard_c) AS max_jaccard_c
      |FROM pairs GROUP BY 1""".stripMargin
  }

  /** Transitive closure of the verified pair graph via a recursive
    * CTE — an INDEPENDENT formulation of what the engine computes by
    * alternating large-star/small-star, so a hash match is evidence.
    * Ends in `comps(doc_id, comp)`; shared by the components oracle
    * and the canonical-selection oracle. */
  private val componentsCtes: String =
    minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs
        |), reach(id, comp) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id
        |), comps AS (
        |  SELECT id AS doc_id, min(comp) AS comp
        |  FROM reach GROUP BY id
        |)""".stripMargin

  private val componentsOracle: String =
    componentsCtes + "\nSELECT doc_id, comp FROM comps"

  private val dedupCanonicalOracle: String =
    componentsCtes +
      """, joined AS (
        |  SELECT c.comp, c.doc_id, d.n_chars
        |  FROM comps c JOIN documents d ON c.doc_id = d.doc_id
        |), ranked AS (
        |  SELECT comp, doc_id,
        |         row_number() OVER (
        |           PARTITION BY comp ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM joined
        |), stats AS (
        |  SELECT comp, count(*) AS n_members,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM joined GROUP BY comp
        |)
        |SELECT s.comp, r.doc_id AS keep_id, s.n_members, s.total_chars
        |FROM stats s JOIN ranked r ON s.comp = r.comp AND r.rn = 1""".stripMargin

  /** DuckDB CTEs computing the `bits`-wide SimHash per doc as `s` —
    * integer-identical to [[TF.simHash]] (vote sums are ints, so the
    * per-bit list_sum replay matches Spark's single-pass fold). */
  private def simhashCtes(bits: Int): String = {
    val votes = (0 until bits).map { j =>
      s"list_sum([CASE WHEN (h >> $j) % 2 = 1 THEN 1 ELSE -1 END for h in hs]) AS v$j"
    }.mkString(",\n    ")
    val assemble = (0 until bits)
      .map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""hs AS (
      |  SELECT doc_id, text,
      |         list_transform($toksSql, tok -> ${hashSql("tok", "sim")}) AS hs
      |  FROM documents
      |), votes AS (
      |  SELECT doc_id, text,
      |    $votes
      |  FROM hs
      |), sh AS (
      |  SELECT doc_id, text, CAST($assemble AS BIGINT) AS s FROM votes
      |)""".stripMargin
  }

  /** DELIBERATELY replays the pre-r16 4×15 banding while the engine
    * runs the Manku-minimal 3×20 ([[TF.simhashBandingFor]]): the
    * verified pair set is banding-invariant for any count > d, and
    * keeping the bandings DIFFERENT makes every round's hash match a
    * machine check of that pigeonhole invariance. The verify radius
    * is INTERPOLATED from [[SimhashHammingMax]] (query and oracle
    * share the one constant), and the replay banding is guarded by
    * the same pigeonhole bound it relies on: 4 bands only guarantee
    * recall while 4 >= d+1, so bumping the radius past 3 fails here
    * LOUDLY instead of silently desynchronizing query from oracle. */
  private val simhashDedupOracle: String = {
    val replayBands = 4
    require(replayBands >= SimhashHammingMax + 1,
      s"simhash oracle's deliberate $replayBands-band replay loses recall at " +
        s"radius $SimhashHammingMax; re-derive the replay banding")
    s"""WITH ${simhashCtes(60)},
      |bands AS (
      |  SELECT doc_id, b, (s >> (b * 15)) & 32767 AS bv
      |  FROM sh, (SELECT unnest(generate_series(0, ${replayBands - 1})) AS b)
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
      |)
      |SELECT c.doc_a, c.doc_b,
      |       CAST(bit_count(xor(x.s, y.s)) AS BIGINT) AS hamming
      |FROM cand c
      |JOIN sh x ON c.doc_a = x.doc_id
      |JOIN sh y ON c.doc_b = y.doc_id
      |WHERE bit_count(xor(x.s, y.s)) <= $SimhashHammingMax""".stripMargin
  }

  private val simhashOracle: String = {
    val votes = (0 until 16).map { j =>
      s"list_sum([CASE WHEN (h >> $j) % 2 = 1 THEN 1 ELSE -1 END for h in hs]) AS v$j"
    }.mkString(",\n    ")
    val assemble = (0 until 16)
      .map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""WITH hs AS (
      |  SELECT doc_id, text,
      |         list_transform($toksSql, tok -> ${hashSql("tok", "sim")}) AS hs
      |  FROM documents
      |), votes AS (
      |  SELECT doc_id, text,
      |    $votes
      |  FROM hs
      |)
      |SELECT doc_id,
      |  list_reduce(list_transform(string_split(text, ''),
      |                             x -> CAST(ascii(x) AS BIGINT)),
      |              (a, b) -> (a * 31 + b) % 1000000007) AS fp_rolling,
      |  substr(md5(text), 1, 16) AS fp_md5,
      |  CAST($assemble AS BIGINT) AS simhash16
      |FROM votes""".stripMargin
  }

  private def hitsSql(words: Seq[String]) =
    s"len(list_filter(t, x -> x IN (${words.map(w => s"'$w'").mkString(", ")})))"

  val oracles: Map[String, String] = Map(
    "quality_percentile" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pr
        |  FROM documents) WHERE pr >= 0.1""".stripMargin,
    "exact_dedup" ->
      """WITH n AS (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
        |  FROM documents
        |)
        |SELECT min(doc_id) AS keeper_id, count(*) AS n_copies,
        |       substr(md5(norm), 1, 16) AS fp
        |FROM n GROUP BY norm""".stripMargin,
    "minhash_dedup" -> minhashOracle,
    // Generated from the SAME bandingFor rule as the query (2x8 at
    // t=0.8): engine-banded, drift-impossible by construction.
    "minhash_dedup_auto" -> minhashAutoOracle,
    // Shared VERBATIM with minhash_dedup: the incremental band-index
    // cycle must produce the identical pair set.
    "minhash_dedup_incr" -> minhashOracle,
    "decontaminate_fuzzy" -> decontamFuzzyOracle,
    "dedup_components" -> componentsOracle,
    "dedup_canonical" -> dedupCanonicalOracle,
    "train_split" -> (componentsCtes +
      s""", bucketed AS (
        |  SELECT d.doc_id,
        |    ${TF.portableHashSql(
               "CAST(coalesce(c.comp, d.doc_id) AS VARCHAR)", "split")}
        |      % 1000 AS b
        |  FROM documents d LEFT JOIN comps c ON d.doc_id = c.doc_id
        |)
        |SELECT doc_id,
        |  CASE WHEN b < 900 THEN 'train'
        |       WHEN b < 950 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM bucketed""".stripMargin),
    "stratified_sample" ->
      s"""SELECT doc_id, lang,
        |       ${TF.portableHashSql("CAST(doc_id AS VARCHAR)", "split")} % 1000 AS gate
        |FROM documents
        |WHERE ${TF.portableHashSql("CAST(doc_id AS VARCHAR)", "split")} % 1000 <
        |      CASE WHEN lang = 'de' THEN 500
        |           WHEN lang = 'en' THEN 250 ELSE 750 END""".stripMargin,
    "ngram_jaccard" ->
      s"""WITH sh AS (
        |  SELECT doc_id, lang,
        |         unnest(list_distinct(${ngramsSql(toksSql, 3)})) AS g
        |  FROM documents
        |), hot AS (
        |  SELECT lang, g FROM (
        |    SELECT lang, g, count(*) AS df FROM sh GROUP BY 1, 2) WHERE df > $DfCap
        |), shc AS (
        |  SELECT sh.* FROM sh WHERE NOT EXISTS (
        |    SELECT 1 FROM hot h WHERE h.lang = sh.lang AND h.g = sh.g)
        |), cnt AS (
        |  SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM shc a JOIN shc b
        |    ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |       CAST(floor(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) * 1e6 + 0.5)
        |            AS BIGINT) AS jaccard_c
        |FROM inter
        |JOIN cnt ca ON doc_a = ca.doc_id
        |JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE CAST(floor(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) * 1e6 + 0.5)
        |           AS BIGINT) >= 200000""".stripMargin,
    "text_stats" ->
      s"""WITH base AS (
        |  SELECT doc_id, text, $toksSql AS t FROM documents
        |), stats AS (
        |  SELECT doc_id, text, t,
        |         CAST(len(t) AS BIGINT) AS n_tokens,
        |         ${hitsSql(Stop)} AS n_stop,
        |         ${hitsSql(Seq("the", "a", "is"))} AS s_en,
        |         ${hitsSql(Seq("el", "la", "los", "que"))} AS s_es,
        |         ${hitsSql(Seq("der", "die", "das", "und"))} AS s_de,
        |         ${hitsSql(Seq("le", "les", "des", "et"))} AS s_fr
        |  FROM base
        |)
        |SELECT doc_id, n_tokens,
        |  CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_tokens_bpe,
        |  CAST(len(text) AS BIGINT) AS n_chars_calc,
        |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
        |  CAST(n_stop AS BIGINT) AS n_stop,
        |  CAST(floor(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e6 + 0.5)
        |       AS BIGINT) AS stop_ratio_c,
        |  CAST(floor((CAST(least(n_tokens, 400) AS DOUBLE) / 400 * 0.5 +
        |              CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 0.5) * 1e6 + 0.5)
        |       AS BIGINT) AS quality_c,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de'
        |       ELSE 'fr' END AS lang_guess
        |FROM stats""".stripMargin,
    "doc_fingerprint" -> simhashOracle,
    "span_dedup" ->
      s"""WITH $spanCtesSql
        |SELECT doc_id,
        |       CAST(min(pos) AS BIGINT) AS span_start,
        |       CAST(max(pos) + ${SpanK - 1} AS BIGINT) AS span_end,
        |       CAST(max(pos) + ${SpanK - 1} - min(pos) + 1 AS BIGINT)
        |         AS span_tokens
        |FROM isl GROUP BY doc_id, island""".stripMargin,
    // Shared VERBATIM with span_dedup: the per-batch index summaries
    // merged by sum/min must mark the identical span set — the hash
    // is the merge-equals-recompute proof.
    "span_dedup_incr" ->
      s"""WITH $spanCtesSql
        |SELECT doc_id,
        |       CAST(min(pos) AS BIGINT) AS span_start,
        |       CAST(max(pos) + ${SpanK - 1} AS BIGINT) AS span_end,
        |       CAST(max(pos) + ${SpanK - 1} - min(pos) + 1 AS BIGINT)
        |         AS span_tokens
        |FROM isl GROUP BY doc_id, island""".stripMargin,
    "span_dedup_cut" ->
      s"""WITH $spanCtesSql,
        |spans AS (
        |  SELECT doc_id, min(pos) AS s, max(pos) + ${SpanK - 1} AS e
        |  FROM isl GROUP BY doc_id, island
        |), tok2 AS (
        |  SELECT doc_id, unnest(t) AS tok,
        |         unnest(generate_series(1, len(t))) AS pos
        |  FROM (SELECT doc_id, $toksSql AS t FROM documents)
        |), covered AS (
        |  SELECT DISTINCT t.doc_id, t.pos
        |  FROM tok2 t JOIN spans s
        |    ON t.doc_id = s.doc_id AND t.pos BETWEEN s.s AND s.e
        |), surv AS (
        |  SELECT t.doc_id, t.pos, t.tok
        |  FROM tok2 t LEFT JOIN covered c
        |    ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL
        |)
        |SELECT doc_id, count(*) AS n_kept,
        |       string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
        |FROM surv GROUP BY doc_id""".stripMargin,
    "simhash_dedup" -> simhashDedupOracle,
    // Shared VERBATIM with simhash_dedup: the incremental band-index
    // cycle must produce the identical pair set.
    "simhash_dedup_incr" -> simhashDedupOracle,
    "corpus_profile" ->
      s"""SELECT lang,
        |  count(*) AS n_docs,
        |  count(DISTINCT source) AS n_sources,
        |  ${EtlQueries.centsSql.format("quantile_cont(n_chars, 0.5)")} AS median_chars_c,
        |  ${EtlQueries.centsSql.format("quantile_cont(n_chars, 0.9)")} AS p90_chars_c,
        |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang""".stripMargin,
    "multimodal_payload" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS payload_sha,
        |       substr(hex(encode(text)), 1, 16) AS head_hex
        |FROM documents""".stripMargin
  )
}
