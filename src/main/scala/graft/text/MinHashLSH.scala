package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale: MinHash signatures +
  * banded LSH + exact-Jaccard verification of candidates.
  *
  * Pipeline (never an all-pairs crossJoin — the whole point at 100 TB):
  *   1. shingle  : distinct word n-grams per doc   (explode, 1 shuffle)
  *   2. minhash  : P independent permutations, sig_p = min over
  *                 shingles of hash_p(shingle)     (groupBy doc)
  *   3. band     : P/R bands of R rows; band key = md5 of the band's
  *                 signature slice
  *   4. candidates: docs sharing a band key (groupBy band key ->
  *                 within-bucket pairs; bucket sizes are tiny because
  *                 a band collision at R=4 needs Jaccard^4 similarity)
  *   5. verify   : exact Jaccard on candidate pairs only, via a
  *                 shingle-set semi-join (no full cross product)
  *
  * All hashes are [[TextFunctions.portableHash]] so a DuckDB oracle can
  * replay the identical pipeline — the candidate sets match exactly,
  * not just statistically.
  */
object MinHashLSH {

  /** (doc_id, shingle) distinct pairs — word `n`-gram shingles. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol), explode(
        TextFunctions.wordNgrams(TextFunctions.tokens(col(textCol)), n))
        .as("shingle"))
      .distinct()

  /** One row per doc: minhash signature columns sig0..sig{p-1}. */
  def signatures(sh: DataFrame, idCol: String, perms: Int): DataFrame =
    sh.groupBy(col(idCol))
      .agg(
        min(TextFunctions.portableHash(col("shingle"), "p0")).as("sig0"),
        (1 until perms).map(p =>
          min(TextFunctions.portableHash(col("shingle"), s"p$p")).as(s"sig$p")): _*)

  /** (doc_id, band_key) — one row per band; band key folds the band
    * index and its R signature values through md5. */
  def bands(sigs: DataFrame, idCol: String, perms: Int, rows: Int): DataFrame = {
    val nBands = perms / rows
    val bandCols = (0 until nBands).map { b =>
      val slice = (b * rows until (b + 1) * rows).map(p => col(s"sig$p"))
      md5(concat_ws("_", (lit(b) +: slice): _*)).as(s"band$b")
    }
    sigs.select((col(idCol) +: bandCols): _*)
      .select(col(idCol), explode(array((0 until nBands).map(b => col(s"band$b")): _*))
        .as("band_key"))
  }

  /** Distinct candidate pairs (a < b) sharing at least one band key.
    * Self-join on the band key: each bucket is small by construction,
    * so the join output is near-linear, not quadratic. */
  def candidates(bandDf: DataFrame, idCol: String): DataFrame = {
    val l = bandDf.select(col("band_key"), col(idCol).as("doc_a"))
    val r = bandDf.select(col("band_key").as("bk2"), col(idCol).as("doc_b"))
    l.join(r, col("band_key") === col("bk2") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact Jaccard for given pairs, via the shingle inverted index:
    * count of co-occurring shingles per pair, over the union size. */
  def verifyJaccard(pairs: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    val counts = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val shA = sh.select(col(idCol).as("doc_a"), col("shingle"))
    val shB = sh.select(col(idCol).as("b_id"), col("shingle").as("sh_b"))
    val inter = pairs
      .join(shA, "doc_a")
      .join(shB, col("doc_b") === col("b_id") && col("shingle") === col("sh_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col(idCol).as("doc_a"), col("n").as("na")), "doc_a")
      .join(counts.select(col(idCol).as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
  }

  /** Full pipeline: verified near-dup pairs with Jaccard >= threshold
    * (scaled to integer millionths for canonical output). */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3, perms: Int = 16, bandRows: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val sh = shingles(docs, idCol, textCol, ngram)
    val sig = signatures(sh, idCol, perms)
    val cand = candidates(bands(sig, idCol, perms, bandRows), idCol)
    verifyJaccard(cand, sh, idCol)
      .withColumn("jaccard_c", floor(col("jaccard") * 1e6 + 0.5d))
      .filter(col("jaccard_c") >= (threshold * 1e6).toLong)
      .select("doc_a", "doc_b", "jaccard_c")
  }
}
