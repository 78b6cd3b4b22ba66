package graft.etl

import graft.SparkSpec

/** Bucketed co-located joins: same bucket spec on both sides must plan
  * with ZERO shuffle exchanges (the scan itself provides the
  * partitioning Catalyst requires). */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("join of co-bucketed tables has no shuffle exchange") {
    val orders = (1L to 200L).map(i => (i, s"o$i")).toDF("k", "ov")
    val items = (1L to 600L).map(i => (i % 200 + 1, s"i$i")).toDF("k", "iv")
    Sink.writeBucketed(orders, "b_orders", Seq("k"), 4, Seq("k"))
    Sink.writeBucketed(items, "b_items", Seq("k"), 4, Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_items"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 600L)
      // Aggregation on the bucket key is exchange-free too.
      val agg = spark.table("b_items").groupBy("k").count()
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
