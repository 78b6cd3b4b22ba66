package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted aggregation / join equivalence with the unsalted plans. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  private def df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong))
    .toDF("k", "v")

  test("saltedAgg == plain groupBy for decomposable aggregates") {
    val salted = Skew.saltedAgg(df, Seq("k"), col("v"), 8)(
        "cnt" -> (count(lit(1)), sum(_)),
        "sum_v" -> (sum(col("v")), sum(_)),
        "max_v" -> (max(col("v")), max(_)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"), max("v").as("max_v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(salted == plain)
  }

  test("saltedJoin == plain join") {
    val build = Seq(("hot", "H"), ("k1", "A"), ("k7", "B")).toDF("k", "label")
    val salted = Skew.saltedJoin(df, build, "k", col("v"), 4)
      .select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val plain = df.join(build, "k").select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq && salted.nonEmpty)
  }
}
