package graft.etl

import graft.SparkSpec

/** Blocked fuzzy matching: planted typos found, blocking respected,
  * the length-difference prefilter never changes results. */
class LinkageSpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    (1L, "john smith", "A"),
    (2L, "jon smith", "A"),   // dist 1 from 1
    (3L, "john smyth", "A"),  // dist 1 from 1, 2 from 2
    (4L, "mary jones", "A"),
    (5L, "john smith", "B"),  // identical name, DIFFERENT block
    (6L, "maria jones", "B"),
    (7L, "completely different", "B")).toDF("id", "name", "blk")

  test("planted typo pairs found within blocks; cross-block identical " +
      "names never pair") {
    val got = Linkage.fuzzyPairs(df, "id", "name", "blk", maxDist = 2)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)),
      s"got $got")
  }

  test("the length-diff prefilter is an optimization, not a semantic: " +
      "results equal the unpruned distance join") {
    val pruned = Linkage.fuzzyPairs(df, "id", "name", "blk", 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val unpruned = {
      import org.apache.spark.sql.functions._
      val a = df.select(col("id").as("ia"), col("name").as("na"),
        col("blk").as("ba"))
      val b = df.select(col("id").as("ib"), col("name").as("nb"),
        col("blk").as("bb"))
      a.join(b, col("ba") === col("bb") && col("ia") < col("ib"))
        .filter(levenshtein(col("na"), col("nb")) <= 3)
        .select("ia", "ib").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(pruned == unpruned)
  }

  test("length-banded blocking returns the IDENTICAL pair set " +
      "(exact recall, no duplicate pairs from the band explosion)") {
    // Mixed name lengths spanning several bands (band width = 4),
    // including a cross-band pair ("jon smith" len 9 band 2 vs
    // "jon smith jr" len 12 band 3, dist 3) that only survives
    // because the build side joins under adjacent bands too.
    val mixed = df.union(Seq(
      (9L, "jon smith jr", "A"),
      (10L, "jo", "A"),
      (11L, "j", "A")).toDF("id", "name", "blk"))
    val plain = Linkage.fuzzyPairs(mixed, "id", "name", "blk", 3)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val banded = Linkage.fuzzyPairsBanded(mixed, "id", "name", "blk", 3)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(banded.sorted == plain.sorted,
      s"banded ${banded.sorted} != plain ${plain.sorted}")
    // Multiset equality above also proves no pair met on two band keys.
    assert(plain.map(p => (p._1, p._2)).toSet
      .contains((2L, 9L)), "expected the cross-band pair to exist")
  }

  test("PassJoin segment blocking returns the IDENTICAL pair set, " +
      "including short-string pairs routed through the fallback") {
    // Mixed lengths: normal names, plus strings SHORTER than the
    // nseg=4 segment count ("jo", "j", "joe") whose pairs can only
    // come from the brute-force short branch, and a short-vs-longer
    // pair ("joe" vs "jones", dist 3) crossing the two branches.
    val mixed = df.union(Seq(
      (9L, "jon smith jr", "A"),
      (10L, "jo", "A"),
      (11L, "j", "A"),
      (12L, "joe", "A"),
      (13L, "jones", "A")).toDF("id", "name", "blk"))
    val plain = Linkage.fuzzyPairs(mixed, "id", "name", "blk", 3)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val seg = Linkage.fuzzyPairsSegmented(mixed, "id", "name", "blk", 3)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(seg.sorted == plain.sorted,
      s"passjoin ${seg.sorted} != plain ${plain.sorted}")
    // The witnesses the branches exist for really are in the set:
    val pairs = plain.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((10L, 11L)), "short-short pair missing")
    assert(pairs.contains((12L, 13L)), "short-vs-longer pair missing")
    assert(pairs.contains((2L, 9L)), "long segment-matched pair missing")
  }

  test("auto blocking routes per block by the pair budget and returns " +
      "the IDENTICAL pair set") {
    // Block A has 6 rows (15 candidate pairs), block B has 3 (3 pairs).
    // pairBudget = 10 routes A through the banded branch and B through
    // the plain one — both branches live in one run — and the result
    // must equal plain fuzzyPairs exactly.
    val mixed = df.union(Seq(
      (9L, "jon smith jr", "A"),
      (10L, "jo", "A")).toDF("id", "name", "blk"))
    val plain = Linkage.fuzzyPairs(mixed, "id", "name", "blk", 3)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    for (budget <- Seq(1L, 10L, 1000L)) {
      val auto = Linkage.fuzzyPairsAuto(mixed, "id", "name", "blk", 3,
          pairBudget = budget)
        .select("id_a", "id_b", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(auto.sorted == plain.sorted,
        s"budget $budget: ${auto.sorted} != ${plain.sorted}")
    }
  }

  test("maxDist 0 degrades to exact in-block duplicate detection") {
    val withDup = df.union(Seq((8L, "mary jones", "A")).toDF("id", "name", "blk"))
    val got = Linkage.fuzzyPairs(withDup, "id", "name", "blk", 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((4L, 8L)))
  }
}
