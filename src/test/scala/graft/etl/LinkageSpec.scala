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

  test("maxDist 0 degrades to exact in-block duplicate detection") {
    val withDup = df.union(Seq((8L, "mary jones", "A")).toDF("id", "name", "blk"))
    val got = Linkage.fuzzyPairs(withDup, "id", "name", "blk", 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((4L, 8L)))
  }
}
