package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text primitives + MinHash-LSH pipeline on a tiny planted fixture. */
class TextSpec extends SparkSpec {

  import spark.implicits._

  test("wordNgrams and charShingles handle short inputs (empty, not [1,0])") {
    val out = Seq("one two", "one").toDF("t")
      .select(TextFunctions.wordNgrams(TextFunctions.tokens(col("t")), 3).as("g"),
        TextFunctions.charShingles(col("t"), 5).as("s"))
      .collect()
    assert(out(0).getSeq[String](0).isEmpty) // 2 tokens < n=3
    assert(out(0).getSeq[String](1) == Seq("one t", "ne tw", "e two"))
    assert(out(1).getSeq[String](0).isEmpty)
  }

  test("rollingFingerprint matches a hand-computed fold") {
    val expected = "ab".foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    val got = Seq("ab").toDF("t")
      .select(TextFunctions.rollingFingerprint(col("t"))).collect().head.getLong(0)
    assert(got == expected) // 97*31 + 98 = 3105
  }

  test("simHash is deterministic and insensitive to token order only in sign-sums") {
    val a = Seq("spark rows spark").toDF("t")
      .select(TextFunctions.simHash(TextFunctions.tokens(col("t")), 16))
      .collect().head.getLong(0)
    val b = Seq("spark spark rows").toDF("t")
      .select(TextFunctions.simHash(TextFunctions.tokens(col("t")), 16))
      .collect().head.getLong(0)
    assert(a == b && a >= 0 && a < (1 << 16))
  }

  test("MinHash-LSH finds the planted near-duplicate and only it") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " w99"
    val unrelated = (100 to 140).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val pairs = MinHashLSH.nearDuplicates(docs, "doc_id", "text",
        ngram = 3, perms = 16, bandRows = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("matchesAgainst finds exactly the planted corpus-vs-reference " +
      "near-dup, in the right direction, with the exact Jaccard") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " w99"
    val unrelated = (100 to 140).map(i => s"u$i").mkString(" ")
    val corpus = Seq((10L, nearDup), (11L, unrelated)).toDF("doc_id", "text")
    val reference = Seq((1L, base)).toDF("doc_id", "text")
    val got = MinHashLSH.matchesAgainst(corpus, reference, "doc_id", "text",
        ngram = 3, perms = 16, bandRows = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 1)
    val (cid, rid, jc) = got.head
    assert(cid == 10L && rid == 1L)
    // 38 shingles each, 37 shared -> J = 37/39.
    assert(jc == math.floor(37.0 / 39.0 * 1e6 + 0.5).toLong, jc.toString)
  }

  test("bandingFor reproduces the hand-pinned production banding at t=0.5 " +
      "and moves with the threshold exactly as the S-curve predicts") {
    // The production operating point: the rule lands on the pinned 4x4.
    assert(MinHashLSH.bandingFor(16, 0.5) == (4, 4))
    // Loose threshold -> wide curve (high recall, more candidates);
    // strict -> narrow curve (candidate volume cut).
    assert(MinHashLSH.bandingFor(16, 0.3) == (8, 2))
    assert(MinHashLSH.bandingFor(16, 0.8) == (2, 8))
    assert(MinHashLSH.bandingFor(16, 0.9) == (1, 16))
    // Rows per band are monotone in the threshold (the curve midpoint
    // (1/B)^(1/R) must track it) — for any budget, not just 16.
    for (perms <- Seq(8, 16, 32)) {
      val rows = Seq(0.2, 0.4, 0.6, 0.8)
        .map(t => MinHashLSH.bandingFor(perms, t)._2)
      assert(rows == rows.sorted, s"perms=$perms rows=$rows")
    }
  }

  test("nearDuplicatesAuto IS nearDuplicates at the rule's banding: " +
      "identical pairs at t=0.5, and at t=0.8 the exact duplicate is " +
      "found deterministically (J=1 collides in every band)") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " w99"
    val unrelated = (100 to 140).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val auto = MinHashLSH.nearDuplicatesAuto(docs, "doc_id", "text",
      ngram = 3, perms = 16, threshold = 0.5).collect().toSeq
    val forced = MinHashLSH.nearDuplicates(docs, "doc_id", "text",
      ngram = 3, perms = 16, bandRows = 4, threshold = 0.5).collect().toSeq
    assert(auto == forced)
    // Second operating point, the WIDE end (t=0.3 -> 8 bands x 2
    // rows): auto is exactly nearDuplicates at the rule's banding
    // there too — pins the rule across the threshold range, not just
    // at the production point.
    val (_, wideRows) = MinHashLSH.bandingFor(16, 0.3)
    assert(wideRows == 2)
    val autoWide = MinHashLSH.nearDuplicatesAuto(docs, "doc_id", "text",
      ngram = 3, perms = 16, threshold = 0.3).collect().toSeq
    val forcedWide = MinHashLSH.nearDuplicates(docs, "doc_id", "text",
      ngram = 3, perms = 16, bandRows = wideRows, threshold = 0.3)
      .collect().toSeq
    assert(autoWide == forcedWide && autoWide.nonEmpty)
    val strictDocs = Seq((1L, base), (2L, base), (3L, unrelated))
      .toDF("doc_id", "text")
    val strict = MinHashLSH.nearDuplicatesAuto(strictDocs, "doc_id", "text",
        ngram = 3, perms = 16, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(strict.toSeq == Seq((1L, 2L, 1000000L)))
  }

  test("simhashBandingFor is the pigeonhole minimum, handles radii that " +
      "don't divide the width (wider last band), and the verified " +
      "pair set is banding-INVARIANT above the radius (3x20 == 4x15)") {
    def even(n: Int, w: Int) = (0 until n).map(b => (b * w, w))
    assert(TextFunctions.simhashBandingFor(60, 2) == even(3, 20))
    assert(TextFunctions.simhashBandingFor(60, 3) == even(4, 15))
    assert(TextFunctions.simhashBandingFor(60, 4) == even(5, 12))
    // d=6: 7 bands over 60 bits — floor split, last band absorbs the
    // remainder (6x8 + 1x12). Disjoint and exhaustive by construction.
    val d6 = TextFunctions.simhashBandingFor(60, 6)
    assert(d6 == (0 until 6).map(b => (b * 8, 8)) :+ (48, 12))
    assert(d6.map(_._2).sum == 60)
    assert(d6.sliding(2).forall { case Seq((s1, w1), (s2, _)) => s1 + w1 == s2 })
    assertThrows[IllegalArgumentException](
      TextFunctions.simhashBandingFor(60, -1))
    assertThrows[IllegalArgumentException](
      TextFunctions.simhashBandingFor(60, 60)) // more bands than bits
    // Fixture: identical docs (hamming 0), a light token edit
    // (hamming small), and an unrelated doc. Verified pairs at
    // radius 2 must be identical under both bandings.
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 39).map(i => s"w$i").mkString(" ") + " w99"),
      (4L, (100 to 140).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      TextFunctions.simHash(TextFunctions.tokens(col("text")), 60).as("s"))
    def pairsBanded(banding: Seq[(Int, Int)]): Seq[(Long, Long, Long)] = {
      val bandArr = array(banding.zipWithIndex.map { case ((shift, width), b) =>
        struct(lit(b).as("b"),
          shiftright(col("s"), shift)
            .bitwiseAND(lit((1L << width) - 1)).as("bv"))
      }: _*)
      val bands = sh.select(col("doc_id"), explode(bandArr).as("band"))
        .select(col("doc_id"), col("band.b").as("b"), col("band.bv").as("bv"))
      bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          expr("bit_count(sa ^ sb)").cast("long").as("hamming"))
        .filter(col("hamming") <= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
    }
    def pairs(nBands: Int, width: Int) =
      pairsBanded((0 until nBands).map(b => (b * width, width)))
    val manku = pairs(3, 20)
    assert(manku == pairs(4, 15))
    // The UNEVEN d=6 split through the same machinery: 7 bands cover
    // radius 6, so a fortiori every radius-2 pair — verified pair set
    // identical again, proving the wider-last-band split preserves
    // the blocking guarantee end-to-end, not just arithmetically.
    assert(manku == pairsBanded(d6))
    assert(manku.contains((1L, 2L, 0L))) // the identical pair survives
    assert(!manku.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated never
  }

  test("simhashDedupIncr merge equals full recompute on the sf0.001 corpus") {
    // The registry row proves this at sf0.01 against the shared
    // oracle; this pins the same merge-equals-recompute contract in
    // the fast suite, including delta-delta, delta-hist and
    // hist-hist pair classes (the %10 split leaves all three
    // populated at this scale iff the full pair set is non-empty
    // across the boundary — asserted below, so the test cannot
    // silently degrade into checking the prior set only).
    val dir = "/root/testdata/sf0.001"
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val full = pairSet(graft.queries.TextQueries.simhashDedup(spark, dir))
    val incr = pairSet(graft.queries.TextQueries.simhashDedupIncr(spark, dir))
    assert(incr == full)
    assert(full.exists { case (a, b, _) => a % 10 < 8 && b % 10 >= 8 },
      "fixture no longer exercises the cross-boundary class")
  }

  test("incremental merges tolerate overlapping hist/delta id spaces: " +
      "no self-pairs, no duplicate verify rows (MinHash and SimHash)") {
    // Doc 2 is re-ingested in the delta with the SAME text (idempotent
    // re-ingestion — the declared overlap contract). Without the
    // doc =!= hdoc guard the delta-hist class emits a (2,2) self-pair
    // at Jaccard 1.0 / hamming 0; without the verify-side dedup the
    // shared signature row multiplies every verify row involving 2;
    // without the cross-class distinct pair (1,2) lands twice
    // (hist-hist and delta-hist).
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    val hist = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val delta = Seq((2L, t), (3L, t)).toDF("doc_id", "text")
    val expected = Set((1L, 2L), (1L, 3L), (2L, 3L))

    val mh = MinHashLSH.incrementalNearDuplicates(
      hist, delta, "doc_id", "text").collect()
    assert(mh.forall(r => r.getLong(0) < r.getLong(1)), "self or unordered pair")
    assert(mh.length == expected.size, s"duplicate rows: ${mh.toSeq}")
    assert(mh.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)

    val sh = graft.queries.TextQueries.simhashIncrementalPairs(hist, delta)
      .collect()
    assert(sh.forall(r => r.getLong(0) < r.getLong(1)), "self or unordered pair")
    assert(sh.length == expected.size, s"duplicate rows: ${sh.toSeq}")
    assert(sh.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    assert(sh.forall(_.getLong(2) == 0L)) // identical texts: hamming 0
  }

  test("exact Jaccard verification value is correct") {
    // doc1: shingles {a b c, b c d}; doc2: {a b c, b c e} -> J = 1/3
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val arrs = MinHashLSH.shingleArrays(docs, "doc_id", "text", 3)
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val j = MinHashLSH.verifyJaccard(pairs, arrs, "doc_id")
      .collect().head.getDouble(2)
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
  }
}
