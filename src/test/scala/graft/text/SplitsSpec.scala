package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic split assignment: ratios, determinism, and the
  * leakage-safety property (a dup cluster never straddles splits). */
class SplitsSpec extends SparkSpec {

  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong).toDF("id")

  test("hashSplit: deterministic, labeled by permille cuts, ratios " +
      "near 90/5/5 at n=20k") {
    val s1 = Splits.hashSplit(ids(20000), "id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Splits.hashSplit(ids(20000), "id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2, "same ids, same salt -> same assignment")
    assert(math.abs(s1("train") - 18000L) < 400, s1.toString)
    assert(math.abs(s1("val") - 1000L) < 150, s1.toString)
    assert(math.abs(s1("test") - 1000L) < 150, s1.toString)
    // A different salt reshuffles membership but keeps ratios.
    val s3 = Splits.hashSplit(ids(20000), "id", salt = "other")
      .filter(col("split") === "val").select("id").as[Long].collect().toSet
    val v1 = Splits.hashSplit(ids(20000), "id")
      .filter(col("split") === "val").select("id").as[Long].collect().toSet
    assert(s3 != v1, "salt must reshuffle membership")
  }

  test("leakageSafeSplit: every cluster member lands in the SAME " +
      "split; singletons follow their own hash") {
    val comps = Seq( // three clusters over 1..9; 10..2000 singletons
      (1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L),
      (6L, 6L), (7L, 6L), (8L, 6L), (9L, 6L)).toDF("id", "comp")
    val out = Splits.leakageSafeSplit(ids(2000), "id", comps)
    val byCluster = out.join(comps, "id")
      .groupBy("comp").agg(countDistinct(col("split")).as("n"))
      .collect().map(_.getLong(1))
    assert(byCluster.forall(_ == 1L),
      "a near-dup cluster must never straddle a split boundary")
    // Members share exactly their canonical's hash label.
    val lbl1 = out.filter(col("id") === 1L).select("split").head.getString(0)
    val lbl3 = out.filter(col("id") === 3L).select("split").head.getString(0)
    assert(lbl1 == lbl3)
    // Singletons match plain hashSplit.
    val single = Splits.hashSplit(ids(2000), "id")
      .filter(col("id") > 9L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val leak = out.filter(col("id") > 9L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(single == leak)
  }

  test("permille cut validation") {
    intercept[IllegalArgumentException](
      Splits.hashSplit(ids(10), "id", trainPm = 980, valPm = 50))
  }
}
