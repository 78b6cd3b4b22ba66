package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** k-anonymity suppression semantics ([[Privacy.kAnonymize]]). */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "a", "x", 10L), (2L, "a", "x", 20L), (3L, "a", "x", 30L),
    (4L, "b", "y", 40L), (5L, "b", "z", 50L)
  ).toDF("id", "q1", "q2", "payload")

  test("groups below k are masked, groups at/above k pass through") {
    val r = Privacy.kAnonymize(df, Seq("q1", "q2"), k = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getString(2), x.getLong(3), x.getLong(4))).toMap
    // (a,x) has 3 members -> kept; (b,y)/(b,z) have 1 -> suppressed.
    assert(r(1L) == ("a", "x", 10L, 0L))
    assert(r(4L) == ("*", "*", 40L, 1L))
    assert(r(5L) == ("*", "*", 50L, 1L))
  }

  test("payload columns are never touched, row count is preserved") {
    val r = Privacy.kAnonymize(df, Seq("q1"), k = 2)
    assert(r.count() == 5)
    assert(r.agg(sum(col("payload"))).head().getLong(0) == 150L)
  }

  test("NULL quasi values form their own group (null-safe join)") {
    val d = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("id", "q1")
    val r = Privacy.kAnonymize(d, Seq("q1"), k = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    // The two NULLs are a group of 2 -> kept; "a" alone -> suppressed.
    assert(r == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("k < 2 and empty quasi list are rejected loudly") {
    intercept[IllegalArgumentException](Privacy.kAnonymize(df, Seq("q1"), 1))
    intercept[IllegalArgumentException](Privacy.kAnonymize(df, Seq.empty, 3))
  }
}
