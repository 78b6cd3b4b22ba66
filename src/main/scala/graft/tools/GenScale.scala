package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of a testdata directory (default 10×),
  * for the at-scale bench soak — the driver's testdata tops out at
  * sf0.1 and is read-only, so larger inputs are derived, not invented.
  *
  * Method: the scaled table is the union of N key-remapped copies of
  * the source. Per-copy transforms are chosen so the WORKLOAD SHAPE is
  * preserved within each copy and copies do not interact:
  *
  *  - Keys get `+ copy * 45,045,000` — the offset is a multiple of
  *    every modulus the query suite derives columns from (45045000 =
  *    2^3 * 3^2 * 5^4 * 7 * 11 * 13, divisible by 2..13 and 1000), so
  *    `key % m` distributions — null slices, skew classes, corrupt
  *    slices — are IDENTICAL in every copy, and foreign keys remap
  *    consistently (joins never match across copies: join fanout per
  *    key is preserved, total output scales by N).
  *  - region/nation stay fixed: dimension cardinality does not grow
  *    with fact volume (the TPC-H scaling rule), which also means
  *    per-dimension group counts stay constant while group SIZES grow
  *    — the correct at-scale aggregation shape.
  *  - Names (p_name/c_name/s_name) get a per-copy " dddddddd" suffix
  *    (8 repeated digits) on EVERY copy, including copy 0 — an
  *    untagged copy would make each name a clean PREFIX of its tagged
  *    twins, which Jaro-Winkler scores 0.91+ (measured: 1.74M
  *    fabricated cross-copy pairs before this was fixed). With uniform
  *    tags: within-copy EDIT DISTANCES are exactly preserved (shared
  *    suffix cancels), cross-copy identical-base twins sit at edit
  *    distance 8 and JW <= ~0.85 < 0.9 (8 unmatched tag chars), and
  *    blocked-linkage CANDIDATE counts — the runtime driver — are
  *    tag-independent (blocking is by brand, candidates are block
  *    pairs). The one measured distortion: within-copy JW scores lift
  *    uniformly (every pair shares the 9-char suffix), so jw_match's
  *    OUTPUT rows at threshold 0.9 are an overcount vs an untagged
  *    corpus; its runtime, being candidate-bound, is unaffected.
  *  - documents: every token gets a per-copy `z<c>` suffix — all
  *    within-copy n-gram/duplicate/near-dup structure is preserved
  *    exactly (dup clusters per copy), while copies share ZERO tokens,
  *    so cross-copy near-dup pairs (which a real 10× corpus would not
  *    have) cannot appear. n_chars is recomputed.
  *  - embeddings: dimensions cyclically rotated by the copy index —
  *    rotation is orthogonal, so every within-copy dot product/cosine
  *    is bit-preserved, while cross-copy similarities decorrelate.
  *
  * Usage: runMain graft.tools.GenScale <srcDir> <outDir> [copies=10]
  */
object GenScale {

  /** Divisible by 2..13 and 1000; far above every source key. */
  val CopyOffset = 45045000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenScale <srcDir> <outDir> [copies]")
    val (src, out) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master("local[16]"), "16")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, copies)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def off(c: Int) = lit(c * CopyOffset)
    def nameTag(c: Int) = " " + (c.toString * 8)
    def scaled(df: DataFrame)(tx: Int => DataFrame => DataFrame): DataFrame =
      (0 until copies).map(c => tx(c)(df)).reduce(_ union _)
    def write(df: DataFrame, t: String, parts: Int = 1): Unit =
      df.coalesce(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")

    // Fixed dimensions: cardinality independent of scale.
    write(read("region"), "region")
    write(read("nation"), "nation")

    def bump(cols: String*)(c: Int)(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + off(c)))
    def suffix(name: String, c: Int)(df: DataFrame): DataFrame =
      df.withColumn(name, concat(col(name), lit(nameTag(c))))

    write(scaled(read("customer"))(c => df =>
      suffix("c_name", c)(bump("c_custkey")(c)(df))), "customer")
    write(scaled(read("supplier"))(c => df =>
      suffix("s_name", c)(bump("s_suppkey")(c)(df))), "supplier")
    write(scaled(read("part"))(c => df =>
      suffix("p_name", c)(bump("p_partkey")(c)(df))), "part")
    write(scaled(read("orders"))(c =>
      bump("o_orderkey", "o_custkey")(c)), "orders", 8)
    write(scaled(read("lineitem"))(c =>
      bump("l_orderkey", "l_partkey", "l_suppkey")(c)), "lineitem", 16)
    write(scaled(read("events"))(c =>
      bump("event_id", "user_id")(c)), "events", 8)

    write(scaled(read("documents"))(c => df => {
      val tagged =
        if (c == 0) df
        else df.withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1z" + c))
      bump("doc_id")(c)(tagged)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }), "documents", 4)

    write(scaled(read("embeddings"))(c => df => {
      // Rotation index wraps (copies can exceed the dimension count —
      // the r10 sf10 run hit slice(_, c+1, 64-c) with c=75); wrapped
      // rotations alone would REPEAT every 64 copies and fabricate
      // exact cross-copy twins, so each copy > 0 additionally applies
      // its own deterministic ±1 sign mask. Both transforms are
      // orthogonal: within-copy dot products and norms are
      // bit-preserved (sign flips cancel pairwise, rotation permutes),
      // cross-copy similarities decorrelate for every copy index.
      val rot = c % 64
      val rotated: Column =
        if (rot == 0) col("embedding")
        else concat(
          slice(col("embedding"), rot + 1, 64 - rot),
          slice(col("embedding"), 1, rot))
      val masked: Column =
        if (c == 0) rotated
        else zip_with(rotated,
          typedlit((0 until 64).map(i => copySign(c, i))),
          (x, s) => x * s)
      bump("vec_id")(c)(df).withColumn("embedding", masked)
    }), "embeddings", 4)
  }

  /** Deterministic ±1f for (copy, dim) — md5-derived like
    * [[graft.sim.Similarity.srpSign]], so regeneration is exact across
    * runs and JVMs. */
  def copySign(c: Int, i: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"genscale:$c:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.take(15), 16) % 2 == 0) 1f else -1f
  }
}
