package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage — approximate matching for the entity fields
  * exact keys can't join: misspelled names, re-keyed registrations,
  * OCR'd identifiers. The reference's patient pipeline links on exact
  * composite keys only; a real master-patient-index pass needs the
  * fuzzy companion.
  *
  * Scale shape: edit distance across all pairs is O(n²) and dies at
  * any scale, so candidate generation is BLOCKED — pairs form only
  * within a block (registration site, birth year, phonetic bucket,
  * an LSH band...), turning cost into Σ|block|². Within a block, a
  * LENGTH-DIFFERENCE prefilter discards pairs that cannot possibly
  * meet the threshold (|len(a) − len(b)| > maxDist implies
  * levenshtein > maxDist) BEFORE the O(len²) distance evaluates —
  * a cheap codegen'd guard ahead of the expensive one. For corpora
  * where blocks themselves grow unbounded, compose with the minhash/
  * SRP blocking in [[graft.text.MinHashLSH]] / [[graft.sim.Similarity]]
  * instead of a categorical block key. */
object Linkage {

  /** Shared blocked candidate-pair scaffold: self-join on the block
    * key, ordered ids (id_a < id_b), both names carried. */
  private def candidatePairs(df: DataFrame, idCol: String,
      nameCol: String, blockCol: String): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      col(blockCol).as("__blk"))
    val b = df.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      col(blockCol).as("__blk_b"))
    a.join(b, col("__blk") === col("__blk_b") && col("id_a") < col("id_b"))
  }

  /** Within-block candidate pairs of `df` whose `nameCol` edit
    * distance is at most `maxDist`: (id_a, id_b, name_a, name_b,
    * dist), id_a < id_b. One shuffle on the block key; the
    * length-difference bound prunes before the distance runs. */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    candidatePairs(df, idCol, nameCol, blockCol)
      // Cheap impossibility bound first; Catalyst keeps this conjunct
      // ahead of the distance computation.
      .filter(abs(length(col("name_a")) - length(col("name_b")))
        <= maxDist)
      // THRESHOLDED levenshtein: the banded dynamic program abandons a
      // pair the moment its distance provably exceeds maxDist —
      // O(maxDist·len) with early exit instead of O(len²) — and most
      // in-block pairs exit early. Returns -1 past the threshold, so
      // `>= 0` IS the complete acceptance test (an extra `<= maxDist`
      // conjunct would survive into the join condition as a second
      // full evaluation of the distance).
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))
  }

  /** Length-banded refinement of [[fuzzyPairs]] — the measured scale
    * lever for blocks that grow too large: a categorical block of
    * size B evaluates ~B²/2 length-filter probes AFTER the shuffle
    * materializes the pairs; banding moves that pruning INTO the join
    * key, so pairs that cannot meet the threshold never form.
    *
    * Exact recall: a pair with `|len(a) − len(b)| <= maxDist` has
    * `floor(len/(maxDist+1))` bands differing by at most 1 (band
    * width > maxDist), so joining each probe row under its own band
    * and each build row under {band−1, band, band+1} keeps every
    * qualifying pair — and each pair meets on exactly ONE key (the
    * probe's band), so no dedup pass is needed. Cost: the build side
    * triples; payoff grows with the number of occupied bands. Measured
    * at sf1 (SCALE.md): 1.2× on TPC-H p_names, whose lengths occupy
    * only TWO width-4 bands — there the gain is finer join-key
    * parallelism; corpora with real length spread (person names,
    * addresses) get candidate pruning on top. The result set is
    * IDENTICAL to [[fuzzyPairs]]; the registry shares the oracle
    * verbatim. */
  def fuzzyPairsBanded(df: DataFrame, idCol: String, nameCol: String,
      blockCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val bw = maxDist + 1
    val band = floor(length(col(nameCol)).cast("double") / bw).cast("long")
    val a = df.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      col(blockCol).as("__blk"), band.as("__band"))
    val b = df.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
        col(blockCol).as("__blk_b"), band.as("__b0"))
      .select(col("id_b"), col("name_b"), col("__blk_b"),
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1))
          .as("__band_b"))
    a.join(b, col("__blk") === col("__blk_b") &&
        col("__band") === col("__band_b") && col("id_a") < col("id_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b")))
        <= maxDist)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))
  }

  /** Segment-blocked refinement of [[fuzzyPairs]] (the PassJoin
    * scheme, Li/Deng/Feng, VLDB 2011) — the CONTENT-based scale lever
    * for blocks whose members share a narrow length range (where
    * [[fuzzyPairsBanded]]'s length bands cannot subdivide): partition
    * each build-side name into `maxDist+1` disjoint segments; by
    * pigeonhole, any pair within edit distance `maxDist` must agree
    * EXACTLY on at least one segment (at a start position shifted by
    * at most `maxDist`), so "shares a segment occurrence" becomes the
    * join key and pairs with no exactly-matching segment — the
    * overwhelming majority of a random block — never form.
    *
    * Exact recall: the pigeonhole guarantee needs every segment
    * non-empty, i.e. build length >= maxDist+1; shorter strings take
    * a brute-force side branch (their whole within-threshold
    * neighborhood is itself length-bounded and tiny). Probe rows
    * enumerate (build length ∈ len±maxDist) × (segment index) ×
    * (shift ∈ ±maxDist) substrings — a constant ~(2·maxDist+1)²·
    * (maxDist+1) per-row projection fan-out, no shuffle until the
    * equi-join on (block, build_len, segment_idx, substring). The
    * tighter multi-match-aware shift rule from the paper would cut
    * probe fan-out a further ~2×; the simple ±maxDist bound keeps the
    * recall argument one line. Result set IDENTICAL to [[fuzzyPairs]];
    * the registry shares the oracle verbatim. */
  def fuzzyPairsSegmented(df: DataFrame, idCol: String, nameCol: String,
      blockCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val nseg = maxDist + 1
    val base = df.select(col(idCol).as("id"), col(nameCol).as("nm"),
      col(blockCol).as("blk"), length(col(nameCol)).cast("long").as("l"))

    // Build side: the nseg disjoint segments of every long-enough name.
    // Segment i of a length-l string covers [i*l/nseg, (i+1)*l/nseg).
    val build = base.filter(col("l") >= nseg)
      .select(col("id").as("id_b"), col("nm").as("name_b"),
        col("blk").as("blk_b"), col("l").as("l_b"),
        explode(sequence(lit(0), lit(nseg - 1))).as("i"))
      .withColumn("st", expr(s"i * l_b DIV $nseg"))
      .withColumn("sl", expr(s"(i + 1) * l_b DIV $nseg") - col("st"))
      .withColumn("seg",
        expr("substring(name_b, CAST(st AS INT) + 1, CAST(sl AS INT))"))
      .select(col("id_b"), col("name_b"), col("blk_b"), col("l_b"),
        col("i"), col("st"), col("sl"), col("seg"))

    // Probe side: every substring of name_a that could equal some
    // segment of a within-threshold partner — enumerated per candidate
    // build length, segment index, and start shift.
    val probe = base
      .select(col("id").as("id_a"), col("nm").as("name_a"), col("blk"),
        col("l").as("l_a"),
        explode(sequence(col("l") - maxDist, col("l") + maxDist))
          .as("l_b"))
      .filter(col("l_b") >= nseg)
      .select(col("id_a"), col("name_a"), col("blk"), col("l_a"),
        col("l_b"), explode(sequence(lit(0), lit(nseg - 1))).as("i"))
      .withColumn("st_b", expr(s"i * l_b DIV $nseg"))
      .withColumn("sl", expr(s"(i + 1) * l_b DIV $nseg") - col("st_b"))
      .select(col("id_a"), col("name_a"), col("blk"), col("l_a"),
        col("l_b"), col("i"), col("st_b"), col("sl"),
        explode(sequence(lit(-maxDist.toLong), lit(maxDist.toLong)))
          .as("d"))
      // Position-aware shift rule (the multi-match-aware bound from
      // the PassJoin paper, §4.2): in any alignment within maxDist,
      // the start shift d of an exactly-matching segment equals the
      // left-side length drift, which costs >= |d| edits on the left
      // and >= |(l_a - l_b) - d| on the right — so a shift with
      // |d| + |Δ - d| > maxDist cannot host the pigeonhole segment of
      // ANY within-threshold pair. Same result set (the oracle hash
      // is shared verbatim with fuzzy_match — machine-proved exact
      // recall); ~2x fewer probe rows enter the segment equi-join.
      .filter(abs(col("d")) +
        abs(col("l_a") - col("l_b") - col("d")) <= maxDist)
      .withColumn("st_a", col("st_b") + col("d"))
      .filter(col("st_a") >= 0 && col("st_a") + col("sl") <= col("l_a"))
      .withColumn("sub",
        expr("substring(name_a, CAST(st_a AS INT) + 1, CAST(sl AS INT))"))

    val segCand = probe.join(build,
        col("blk") === col("blk_b") && probe("l_b") === build("l_b") &&
          probe("i") === build("i") && col("sub") === col("seg") &&
          col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))

    // Fallback for build strings too short for non-empty segments:
    // their within-threshold neighborhood is length <= 2*maxDist, a
    // vanishing sub-population — brute within the block is exact.
    val shortB = base.filter(col("l") < nseg)
      .select(col("id").as("id_b"), col("nm").as("name_b"),
        col("blk").as("blk_b"))
    val nearA = base.filter(col("l") <= (nseg - 1) + maxDist)
      .select(col("id").as("id_a"), col("nm").as("name_a"), col("blk"))
    val shortCand = nearA.join(shortB,
        col("blk") === col("blk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))

    segCand.union(shortCand).distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))
  }

  /** ENGINE-CHOSEN blocking — the knob SCALE.md §1 left to the caller
    * ("a finer blocking key remains the caller's first knob"), made
    * automatic: measure every block first, and only where the
    * quadratic candidate budget is blown compose the finer
    * (block × length-band) key of [[fuzzyPairsBanded]] — per block,
    * not globally, so small blocks keep the cheaper plain key (no
    * build-side tripling) and oversized blocks get subdivided.
    *
    * `pairBudget` bounds the candidate pairs ONE block may generate:
    * a block of n rows forms n·(n−1)/2 within-block candidates; blocks
    * over budget route to the banded branch. The stats pass is one
    * count-per-key aggregate (block-cardinality-sized output — tiny
    * next to the corpus at any scale) broadcast back as the routing
    * flag, so the corpus itself never shuffles for the decision.
    *
    * Exact recall: both rows of any qualifying pair share a block,
    * hence a routing flag, so every pair is produced by exactly one
    * branch and the union IS [[fuzzyPairs]]'s result set — the
    * registry shares the oracle verbatim, making the hash a machine
    * proof. */
  def fuzzyPairsAuto(df: DataFrame, idCol: String, nameCol: String,
      blockCol: String, maxDist: Int,
      pairBudget: Long = 1L << 22): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(pairBudget >= 1, s"pairBudget must be >= 1, got $pairBudget")
    val oversized = df.groupBy(col(blockCol).as("__stat_blk"))
      .agg(count(lit(1)).as("__blk_n"))
      .filter(col("__blk_n") * (col("__blk_n") - 1) / 2 > pairBudget)
      .select(col("__stat_blk"))
    val flagged = df.join(broadcast(oversized),
      col(blockCol) === col("__stat_blk"), "left")
    val small = flagged.filter(col("__stat_blk").isNull).drop("__stat_blk")
    val big = flagged.filter(col("__stat_blk").isNotNull).drop("__stat_blk")
    fuzzyPairs(small, idCol, nameCol, blockCol, maxDist)
      .unionByName(fuzzyPairsBanded(big, idCol, nameCol, blockCol, maxDist))
  }

  /** Graded variant of [[fuzzyPairs]]: within-block pairs scored by
    * native Jaro-Winkler similarity
    * ([[graft.expressions.JaroWinklerExpr]], codegen'd in the join's
    * hot loop), keeping pairs at or above `minSim`. Edit distance
    * counts edits; Jaro-Winkler grades prefix-weighted likeness —
    * the usual scorer for human-entered name drift. */
  def jaroWinklerPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCol: String, minSim: Double): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0, s"minSim in [0,1], got $minSim")
    candidatePairs(df, idCol, nameCol, blockCol)
      .withColumn("sim",
        call_function("graft_jaro_winkler", col("name_a"), col("name_b")))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("sim"))
  }
}
