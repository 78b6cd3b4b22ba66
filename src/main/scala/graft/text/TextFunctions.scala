package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the training-data-pipeline operators.
  * Everything is built from codegen'd built-ins (no UDFs), and every
  * primitive has an exact DuckDB-SQL equivalent so the operators can be
  * oracle-checked bit-for-bit.
  */
object TextFunctions {

  /** Portable 60-bit hash: integer value of the first 15 hex chars of
    * md5(salt:value). md5 is identical everywhere, and 15 hex digits
    * always fit a positive BIGINT, so Spark's
    * `conv(substring(md5(...)), 16, 10)` and DuckDB's
    * `CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)` agree exactly.
    * Used for minhash permutations / simhash bits instead of
    * `xxhash64`, which DuckDB cannot reproduce. */
  def portableHash(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), c)), 1, 15), 16, 10)
      .cast("long")

  /** DuckDB rendering of [[portableHash]] over SQL fragment `e`. */
  def portableHashSql(e: String, salt: String): String =
    s"CAST('0x' || substr(md5('$salt:' || $e), 1, 15) AS BIGINT)"

  /** Hex-string form of the portable hash: the fixed-width lowercase
    * hex prefix orders lexicographically exactly as its numeric value,
    * so min/max-style uses can skip the hex->int conversion (a
    * BigInteger parse per call — measurable at tens of millions of
    * hashes). */
  def portableHashHex(c: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"), c)), 1, 15)

  def portableHashHexSql(e: String, salt: String): String =
    s"substr(md5('$salt:' || $e), 1, 15)"

  /** Whitespace tokenization. */
  def tokens(c: Column): Column = split(c, "\\s+")

  /** BPE-ish token count: words plus individual punctuation marks. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0))).cast("long")

  /** Word n-grams over a token array (space-joined strings). Guarded:
    * Spark's `sequence(1, 0)` yields a DESCENDING [1,0], not an empty
    * array, so short inputs must short-circuit explicitly. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    .otherwise(array().cast("array<string>"))

  /** Character k-shingles (same short-input guard). */
  def charShingles(c: Column, k: Int): Column =
    when(length(c) >= k,
      transform(sequence(lit(1), length(c) - (k - 1)),
        i => c.substr(i, lit(k))))
    .otherwise(array().cast("array<string>"))

  /** Polynomial rolling hash over the characters (mod 1e9+7), the
    * classic document-fingerprint primitive; left-fold order matches
    * DuckDB's `list_reduce`. */
  def rollingFingerprint(c: Column): Column =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)

  /** SimHash over the token stream, `bits` wide (max 60 — the hash
    * width): bit j is 1 iff the sum of +/-1 votes from tokens' j-th
    * hash bits is positive. Uses the native
    * [[graft.expressions.SimHashExpr]] (registered by GraftExtensions)
    * — bit-identical to [[simHashBuiltin]], without the interpreted
    * higher-order-function fold. */
  def simHash(toks: Column, bits: Int): Column =
    call_function("graft_simhash", toks, lit(bits))

  /** Banding for hamming-radius LSH over [[simHash]] fingerprints,
    * ENGINE-DERIVED from the verification radius by the pigeonhole
    * principle (Manku, Jain & Das Sarma, "Detecting Near-Duplicates
    * for Web Crawling", WWW 2007): a pair differing in at most d bits
    * must agree EXACTLY on at least one of d+1 disjoint bands, so
    * bands = hammingMax + 1 is the minimal count with guaranteed
    * recall — and the minimum is also the cheapest: fewer bands mean
    * fewer exploded band tuples AND wider bands, whose exact-match
    * collisions are exponentially rarer (a 20-bit band admits 2⁵×
    * fewer false candidates than a 15-bit one). A hand-pinned count
    * above the minimum only adds candidate volume; one below it
    * SILENTLY loses true pairs.
    *
    * Returns one (shiftBits, bandWidth) per band. When d+1 does not
    * divide the signature width (e.g. radius 6 over 60 bits), the
    * first d bands take the floor width and the LAST band absorbs the
    * remainder — the pigeonhole argument only needs the bands to be
    * disjoint and exhaustive, and the extra bits go to a single band
    * where they make exact-match collisions RARER, never to a
    * narrower band that would widen the candidate set. */
  def simhashBandingFor(bits: Int, hammingMax: Int): Seq[(Int, Int)] = {
    val bands = hammingMax + 1
    require(hammingMax >= 0 && bands <= bits,
      s"simhashBandingFor: need 0 <= hammingMax < bits, got ($bits, $hammingMax)")
    val base = bits / bands
    (0 until bands).map { b =>
      val width = if (b == bands - 1) bits - base * (bands - 1) else base
      (b * base, width)
    }
  }

  /** Built-in-functions formulation of [[simHash]] (reference
    * semantics spec + fallback for sessions without GraftExtensions).
    *
    * Single pass: ONE md5 per token and ONE traversal of the token
    * array, folding a `bits`-wide vote vector (a first cut ran one
    * aggregate per bit — 16x the md5 work). Bit tests use `h & 2^j`
    * against a precomputed power array, which DuckDB reproduces as
    * `(h >> j) % 2` — integer-identical. */
  def simHashBuiltin(toks: Column, bits: Int): Column = {
    require(bits <= 60, "portableHash provides 60 bits")
    val powers = array((0 until bits).map(j => lit(1L << j)): _*)
    val hashes = transform(toks, t => portableHash(t, "sim"))
    aggregate(
      hashes,
      array_repeat(lit(0L), bits),
      (acc, h) => zip_with(acc, powers,
        (a, p) => a + when(h.bitwiseAND(p) =!= 0, lit(1L)).otherwise(lit(-1L))),
      votes => aggregate(
        zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
        lit(0L), (s, x) => s + x))
  }
}
