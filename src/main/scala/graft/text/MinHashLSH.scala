package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale: MinHash signatures +
  * banded LSH + exact-Jaccard verification of candidates.
  *
  * Pipeline (never an all-pairs crossJoin — the whole point at 100 TB):
  *   1. shingle  : distinct word n-grams per doc as an ARRAY column
  *   2. minhash  : explode once, P codegen'd min-aggregates -> one
  *                 signature row per doc (single shuffle, and the only
  *                 consumer of the exploded view — nothing recomputes)
  *   3. band     : P/R bands of R rows; band key = md5 of the band's
  *                 signature slice; explode is 1 row per (doc, band)
  *   4. candidates: docs sharing a band key (self-join on the key;
  *                 buckets are tiny because a band collision at R=4
  *                 needs Jaccard^4 similarity)
  *   5. verify   : exact Jaccard via array_intersect on the candidate
  *                 pairs only (pairs are few and broadcast; the
  *                 shingle arrays are rebuilt in a cheap projection,
  *                 no hashing)
  *
  * All hashes are [[TextFunctions.portableHash]] so a DuckDB oracle can
  * replay the identical pipeline — the candidate sets match exactly,
  * not just statistically.
  */
object MinHashLSH {

  /** (id, shingles array<string> distinct) — word `n`-gram shingles.
    * Input is spread across the shuffle width first: the n-gram
    * construction is the pipeline's heaviest projection and must not
    * run on a single input split. */
  def shingleArrays(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    graft.Tables.spread(docs).select(col(idCol),
      call_function("graft_shingles",
        TextFunctions.tokens(col(textCol)), lit(n)).as("shingles"))

  /** Exploded (id, shingle) view — for tests and inverted-index uses. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleArrays(docs, idCol, textCol, n)
      .select(col(idCol), explode(col("shingles")).as("shingle"))

  /** One row per doc: minhash signature columns sig0..sig{p-1}, via
    * the native [[graft.expressions.MinHashSigsExpr]] — all perms
    * minima in one pass over the shingle array, NO explode and NO
    * shuffle (the earlier exploded groupBy/min formulation shuffled
    * |docs| x |shingles| rows; the interpreted array_min(transform(...))
    * alternative was 2x slower than even that). Values are identical:
    * min over the fixed-width md5 hex prefix under salt `p<i>:`.
    * Docs with zero shingles are dropped (they can't be near-dups, and
    * a null signature would otherwise collide all of them into one
    * band bucket). */
  def signatures(arrs: DataFrame, idCol: String, perms: Int): DataFrame = {
    val sigs = arrs
      .filter(size(col("shingles")) > 0)
      .select(col(idCol),
        call_function("graft_minhash_sigs", col("shingles"), lit(perms))
          .as("sigs"))
    sigs.select(col(idCol) +: (0 until perms).map(p =>
      element_at(col("sigs"), p + 1).as(s"sig$p")): _*)
  }

  /** (id, band_key) — one row per band; band key folds the band index
    * and its R signature values through md5. */
  def bands(sigs: DataFrame, idCol: String, perms: Int, rows: Int): DataFrame =
    sigs.select(col(idCol),
      explode(array(bandKeys(perms, rows, p => col(s"sig$p")): _*))
        .as("band_key"))

  /** The band-key fold shared by every banding consumer: md5 over the
    * band index and its R signature values, `sig` supplying the p-th
    * signature expression. ONE definition so the batch pipeline, the
    * payload-carrying stream variant and the generated DuckDB oracles
    * cannot drift. */
  private def bandKeys(perms: Int, rows: Int,
      sig: Int => Column): Seq[Column] =
    (0 until perms / rows).map { b =>
      val slice = (b * rows until (b + 1) * rows).map(sig)
      md5(concat_ws("_", (lit(b) +: slice): _*))
    }

  /** (id, shingles, band_key) — [[bands]] KEEPING the shingle array
    * beside every band tuple. The streaming probe needs this: a
    * stream cannot statelessly re-join its own derivation to recover
    * the shingles for the exact-Jaccard verify, so they ride the
    * banding projection instead (one array ref per band row — column
    * pruning keeps it a pointer, not a copy, until the verify). */
  def bandedShingles(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int, perms: Int, rows: Int): DataFrame =
    shingleArrays(docs, idCol, textCol, ngram)
      .filter(size(col("shingles")) > 0)
      .select(col(idCol), col("shingles"),
        call_function("graft_minhash_sigs", col("shingles"), lit(perms))
          .as("__sigs"))
      .select(col(idCol), col("shingles"),
        explode(array(bandKeys(perms, rows,
          p => element_at(col("__sigs"), p + 1)): _*)).as("band_key"))

  /** Distinct candidate pairs (a < b) sharing at least one band key.
    * The band self-join is skew-routed ([[graft.etl.Skew
    * .selfPairsByBucket]]): a hot band key — boilerplate text whose
    * band signature thousands of documents share — would otherwise
    * serialize its quadratic pair fan-out in one task. */
  def candidates(bandDf: DataFrame, idCol: String): DataFrame =
    candidatePairs(bandDf.select(col("band_key"), col(idCol).as("doc")))

  /** [[candidates]] over the canonical (band_key, doc) projection —
    * split out so [[incrementalNearDuplicates]] can build its other
    * candidate classes from the IDENTICAL projection and have their
    * band exchanges unify at runtime (ReusedExchange). */
  private def candidatePairs(proj: DataFrame): DataFrame =
    graft.etl.Skew.selfPairsByBucket(proj, Seq("band_key"), Seq("doc"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()

  /** Exact Jaccard for candidate pairs via array intersection (the
    * pair side is small and broadcasts). */
  def verifyJaccard(pairs: DataFrame, arrs: DataFrame, idCol: String): DataFrame = {
    val a = arrs.select(col(idCol).as("doc_a"), col("shingles").as("sh_a"))
    val b = arrs.select(col(idCol).as("doc_b"), col("shingles").as("sh_b"))
    broadcast(pairs)
      .join(a, "doc_a")
      .join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) -
            size(array_intersect(col("sh_a"), col("sh_b")))))
          .as("jaccard"))
  }

  /** Asymmetric LSH match of a corpus against a SMALL reference set —
    * the fuzzy-decontamination / reference-lookup form of
    * [[nearDuplicates]]: instead of a self-join, corpus band keys
    * probe the reference's banded signatures, and only the surviving
    * candidates get exact-Jaccard verification.
    *
    * Returns (corpus_id, ref_id, jaccard_c ppm) for verified matches
    * with Jaccard >= threshold.
    *
    * Shape at scale: the reference side (an eval set — thousands of
    * docs next to a 100 TB corpus) broadcasts at BOTH joins (bands
    * and shingle arrays), and the candidate frame broadcasts back
    * onto the corpus arrays — the corpus itself never shuffles. The
    * signature pass is the same single-projection
    * [[graft.expressions.MinHashSigsExpr]] as the self-join form. */
  def matchesAgainst(corpus: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, ngram: Int = 3, perms: Int = 16,
      bandRows: Int = 4, threshold: Double = 0.5): DataFrame = {
    val cArr = shingleArrays(corpus, idCol, textCol, ngram)
    val rArr = shingleArrays(reference, idCol, textCol, ngram)
    val cBand = bands(signatures(cArr, idCol, perms), idCol, perms, bandRows)
      .select(col("band_key"), col(idCol).as("corpus_id"))
    val rBand = bands(signatures(rArr, idCol, perms), idCol, perms, bandRows)
      .select(col("band_key").as("bk2"), col(idCol).as("ref_id"))
    val cand = cBand.join(broadcast(rBand), col("band_key") === col("bk2"))
      .select("corpus_id", "ref_id").distinct()
    val a = cArr.select(col(idCol).as("corpus_id"), col("shingles").as("sh_a"))
    val b = rArr.select(col(idCol).as("ref_id"), col("shingles").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    broadcast(cand)
      .join(a, "corpus_id")
      .join(broadcast(b), "ref_id")
      .select(col("corpus_id"), col("ref_id"),
        floor(inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter) * 1e6 + 0.5d)
          .cast("long").as("jaccard_c"))
      // math.round, not .toLong: truncation would put e.g. 0.7's
      // cutoff one millionth below the oracle's exact integer.
      .filter(col("jaccard_c") >= math.round(threshold * 1e6))
  }

  /** The LSH BANDING chosen by the engine — the last hand-pinned
    * knob of the blocked-pair families freed, completing the set
    * (SRP planes = `planesFor`, IVF probes = `nprobeFor`, assignment
    * strategy = `FlatCentersMax`, exchange payload =
    * `FloatPayloadBytesMax`, SDC gate = `sdcGateFor`). A banding of
    * B bands × R rows admits a pair of Jaccard s as a candidate with
    * probability P(s) = 1 − (1 − s^R)^B; the right (B, R) for a
    * query is the factorization of the signature budget whose curve
    * best approximates the step at the query's own verification
    * threshold — minimize the false-candidate integral below t (pure
    * pair-stage compute at 100 TB) plus the missed-pair integral
    * above it (lost recall), equally weighted. The standard LSH
    * S-curve construction from the MinHash literature (Leskovec et
    * al., Mining of Massive Datasets ch. 3). Deterministic in
    * (perms, threshold) alone — a 1000-point driver-side quadrature
    * over at most d(perms) factorizations, no corpus measurement —
    * so a generated oracle can call the same rule and can never
    * drift from the query. At the production threshold 0.5 with the
    * 16-perm budget the rule lands exactly on the hand-pinned
    * 4×4 banding (spec-pinned); at stricter thresholds it narrows
    * the curve (0.8 → 2 bands × 8 rows), cutting the candidate
    * (= pair-work) volume instead of over-probing. */
  def bandingFor(perms: Int, threshold: Double): (Int, Int) = {
    require(perms > 0 && threshold > 0.0 && threshold < 1.0,
      s"bandingFor needs perms>0 and threshold in (0,1), got ($perms, $threshold)")
    val grid = 1000
    def err(b: Int, r: Int): Double = {
      var fp = 0.0; var fn = 0.0; var i = 0
      while (i < grid) {
        val s = (i + 0.5) / grid
        val p = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
        if (s < threshold) fp += p else fn += 1.0 - p
        i += 1
      }
      (fp + fn) / grid
    }
    (1 to perms).filter(perms % _ == 0)
      .map(r => (perms / r, r))
      .minBy { case (b, r) => err(b, r) }
  }

  /** [[nearDuplicates]] with the banding chosen by [[bandingFor]]
    * from the query's own threshold. */
  def nearDuplicatesAuto(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, perms: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val (_, rows) = bandingFor(perms, threshold)
    nearDuplicates(docs, idCol, textCol, ngram, perms, rows, threshold)
  }

  /** Full pipeline: verified near-dup pairs with Jaccard >= threshold
    * (scaled to integer millionths for canonical output). */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, perms: Int = 16, bandRows: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val arrs = shingleArrays(docs, idCol, textCol, ngram)
    val cand = candidates(
      bands(signatures(arrs, idCol, perms), idCol, perms, bandRows), idCol)
    thresholded(verifyJaccard(cand, arrs, idCol), threshold)
  }

  private def thresholded(verified: DataFrame, threshold: Double): DataFrame =
    verified
      .withColumn("jaccard_c", floor(col("jaccard") * 1e6 + 0.5d))
      // math.round, not .toLong: truncation would put e.g. 0.7's
      // cutoff one millionth below the oracle's exact integer.
      .filter(col("jaccard_c") >= math.round(threshold * 1e6))
      .select("doc_a", "doc_b", "jaccard_c")

  /** INCREMENTAL near-dup maintenance across doc-atomic load cycles —
    * the [[graft.text.SpanIndex]] pattern for the MinHash family. The
    * stored state of a cycle is its band-tuple index (id, band_key)
    * plus its verified pair set; absorbing a delta costs:
    *
    *  1. shingle/sign/band the DELTA only — |delta| work;
    *  2. join the delta's band tuples against stored ∪ delta tuples —
    *    exactly the candidate pairs involving a delta doc (band keys
    *    are per-document, so they are identical to what a full
    *    recompute would produce);
    *  3. exact-verify those candidates and union the PRIOR cycle's
    *    pairs, which cannot change (a within-history pair shares no
    *    doc with the delta).
    *
    * History is never re-shingled and never re-self-joined. The
    * merge-equals-recompute guarantee is machine-checked by the
    * `minhash_dedup_incr` registry row (oracle shared verbatim with
    * `minhash_dedup`). Here the prior pairs/bands are recomputed from
    * `histDocs` for the proof; a deployment reads both back from the
    * stored cycle tables. The proof recomputation is structured to
    * pay for history ONCE, not once per consumer:
    *
    *  - prior candidates come from the same band frames the delta
    *    absorbs against (no nested full-pipeline call re-shingling
    *    history);
    *  - the delta-vs-history candidate class consumes the IDENTICAL
    *    (band_key, doc) projection + band_key exchange that the
    *    hist-hist self-join creates, so at runtime the expensive
    *    shingle → sign → band subtree over history materializes once
    *    and the second consumer is a ReusedExchange (same for the
    *    delta side against its own self-join); plan-audited;
    *  - the exact verify runs ONE broadcast over the unioned
    *    candidate set, deduped across the hist-hist / delta-hist /
    *    delta-delta classes — row-identical to verifying each class
    *    alone (the dedup is a no-op when the id spaces are disjoint;
    *    with a re-ingested id it is what keeps it so).
    *
    * Id spaces MAY overlap — a doc re-ingested in the delta with the
    * SAME text (an updated text needs a delete cycle first, out of
    * scope): the delta-hist class filters `doc =!= hdoc` so a shared
    * id cannot emit a Jaccard-1.0 self-pair, and the verify-side
    * shingle arrays are deduped by id so it cannot multiply verify
    * rows. A caller who can PROVE the id spaces disjoint (e.g. delta
    * ids minted above the history's ceiling, or a partitioning rule
    * like the registry's doc_id % 10 split) passes
    * `disjointIds = true` to skip the two dedup exchanges — the
    * corpus-sized verify-side one is the only super-|delta| cost the
    * guards add; the self-pair filter is free and stays always.
    *
    * (Measured at sf1/80k docs: the original nested form re-signed
    * history in four independent subtrees — the dominant per-doc
    * cost — and ran ~6× its full-recompute sibling; once-per-stage
    * brought it to ~2.3×; exchange reuse prices the proof near the
    * sibling + the delta machinery.) */
  def incrementalNearDuplicates(histDocs: DataFrame, deltaDocs: DataFrame,
      idCol: String, textCol: String, ngram: Int = 3, perms: Int = 16,
      bandRows: Int = 4, threshold: Double = 0.5,
      disjointIds: Boolean = false): DataFrame = {
    val histArrs = shingleArrays(histDocs, idCol, textCol, ngram)
    val deltaArrs = shingleArrays(deltaDocs, idCol, textCol, ngram)
    val histProj =
      bands(signatures(histArrs, idCol, perms), idCol, perms, bandRows)
        .select(col("band_key"), col(idCol).as("doc"))
    val deltaProj =
      bands(signatures(deltaArrs, idCol, perms), idCol, perms, bandRows)
        .select(col("band_key"), col(idCol).as("doc"))
    val prior = candidatePairs(histProj)          // hist-hist
    val freshDelta = candidatePairs(deltaProj)    // delta-delta
    // delta-hist: both sides repartitioned exactly as their self-join
    // frames are inside selfPairsByBucket — identical Exchange nodes,
    // unified by ReuseExchange, so neither corpus is re-signed here.
    val freshHist = deltaProj.repartition(col("band_key"))
      .join(histProj.repartition(col("band_key"))
        .withColumnRenamed("doc", "hdoc"), "band_key")
      // Guard against overlapping id spaces (a doc re-ingested in the
      // delta): without it a shared id emits a (a,a) self-pair that
      // verifies at Jaccard 1.0 and surfaces as a bogus duplicate.
      .filter(col("doc") =!= col("hdoc"))
      .select(least(col("doc"), col("hdoc")).as("doc_a"),
        greatest(col("doc"), col("hdoc")).as("doc_b"))
      .distinct()
    // Verify-side shingle arrays deduped by id: an id shared between
    // history and delta (idempotent re-ingestion — same text; an
    // UPDATED text needs a delete cycle first, out of scope) would
    // otherwise join twice and multiply verify rows. The cross-class
    // candidate union is deduped too: with a shared id the same pair
    // can surface from two classes (e.g. hist-hist AND delta-hist).
    // Both dedups are skipped under the caller's disjointness proof —
    // they'd be semantic no-ops but cost real exchanges (the verify-
    // side one corpus-sized).
    val cands = prior.unionByName(freshHist).unionByName(freshDelta)
    val arrs = histArrs.unionByName(deltaArrs)
    thresholded(
      verifyJaccard(
        if (disjointIds) cands else cands.distinct(),
        if (disjointIds) arrs else arrs.dropDuplicates(idCol), idCol),
      threshold)
  }
}
