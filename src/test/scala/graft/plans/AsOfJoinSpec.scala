package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AsOf.join]]: semantics (latest right row with time <= left time
  * per key, left outer), null rules, plan shape (custom exec with
  * co-partitioning exchanges), and equivalence with an independent
  * fan-out-join formulation on random data. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf: DataFrame = Seq(
    (1L, 10L, "l-a"), (1L, 20L, "l-b"), (2L, 5L, "l-c"),
    (3L, 7L, "l-d")
  ).toDF("k", "t", "lv")

  private def rightDf: DataFrame = Seq(
    (1L, 8L, "r-early"), (1L, 15L, "r-mid"), (1L, 25L, "r-late"),
    (2L, 6L, "r-future")
  ).toDF("rk", "rt", "rv")

  test("matches the greatest right time <= left time, left outer") {
    val j = AsOf.join(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
      .select($"k", $"t", $"rv")
    val got = j.collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 10L, Some("r-early")),  // 8 <= 10 < 15
      (1L, 20L, Some("r-mid")),    // 15 <= 20 < 25
      (2L, 5L, None),              // only right time is 6 > 5
      (3L, 7L, None)))             // no right key
  }

  test("null keys and null times never match; null right times skipped") {
    val l = Seq((Option(1L), Option(10L), "a"), (None, Option(10L), "b"),
      (Option(1L), None, "c")).toDF("k", "t", "lv")
    val r = Seq((Option(1L), Option(5L), "m"), (Option(1L), None, "skip"),
      (None, Option(1L), "nk")).toDF("k", "rt", "rv")
    val got = AsOf.join(l, r, Seq("k"), Seq("k"), "t", "rt")
      .select($"lv", $"rv").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    assert(got == Set(("a", Some("m")), ("b", None), ("c", None)))
  }

  test("plans as AsOfJoinExec with co-partitioning exchanges and sorts") {
    val j = AsOf.join(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
    val plan = j.queryExecution.executedPlan.toString()
    assert(j.queryExecution.executedPlan.collectFirst {
      case e: AsOfJoinExec => e }.isDefined ||
      plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("composite keys and date times work end-to-end") {
    val l = Seq((1L, "x", "2024-03-01", "L1"), (1L, "y", "2024-03-01", "L2"))
      .toDF("k1", "k2", "d", "lv")
      .withColumn("d", col("d").cast("date"))
    val r = Seq((1L, "x", "2024-02-01", "R1"), (1L, "y", "2024-03-02", "R2"))
      .toDF("k1", "k2", "rd", "rv")
      .withColumn("rd", col("rd").cast("date"))
    val got = AsOf.join(l, r, Seq("k1", "k2"), Seq("k1", "k2"), "d", "rd")
      .select($"lv", $"rv").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    assert(got == Set(("L1", Some("R1")), ("L2", None)))
  }

  test("agrees with the fan-out inequality-join formulation on 20k random rows") {
    val l = spark.range(10000).select(
      (col("id") % 89).as("k"), ((col("id") * 37) % 5000).as("t"),
      col("id").as("lid"))
    val r = spark.range(10000).select(
      (col("id") % 97).as("k"), ((col("id") * 53) % 5000).as("rt"),
      col("id").as("rid"))
      // unique (k, rt) so the as-of match is deterministic
      .groupBy("k", "rt").agg(max("rid").as("rid"))
    val fast = AsOf.join(l, r.withColumnRenamed("k", "rk"),
        Seq("k"), Seq("rk"), "t", "rt")
      .select($"k", $"t", $"lid", $"rid")

    // Independent formulation: fan-out join + row_number pick.
    val w = Window.partitionBy($"k", $"t", $"lid").orderBy($"rt".desc_nulls_last)
    val slow = l.join(r.withColumnRenamed("k", "jk"),
        $"k" === $"jk" && $"rt" <= $"t", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"k", $"t", $"lid", $"rid")

    def toSet(df: DataFrame) = df.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    assert(toSet(fast) == toSet(slow))
  }

  test("result is invariant to input partitioning") {
    val base = AsOf.join(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
      .select($"k", $"t", $"rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    val shuffled = AsOf.join(
        leftDf.repartition(7, $"t"), rightDf.repartition(3, $"rv"),
        Seq("k"), Seq("rk"), "t", "rt")
      .select($"k", $"t", $"rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(base == shuffled)
  }

  test("broadcast variant: no shuffle, build flows through ONE broadcast exchange") {
    val j = AsOf.join(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt",
      broadcastRight = true)
    val plan = j.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    // The build side is a real BroadcastExchange (accounted, reusable)
    // carrying the AsOfBuildMode; the stream side never shuffles.
    assert("BroadcastExchange".r.findAllIn(plan).size == 1,
      s"build must go through exactly one broadcast exchange:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"broadcast as-of must not shuffle:\n$plan")
    val got = j.select($"k", $"t", $"rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      (1L, 10L, Some("r-early")), (1L, 20L, Some("r-mid")),
      (2L, 5L, None), (3L, 7L, None)))
  }

  test("broadcast variant agrees with the sort-merge variant on 20k random rows") {
    val l = spark.range(10000).select(
      (col("id") % 89).as("k"), ((col("id") * 37) % 5000).as("t"),
      col("id").as("lid"))
    val r = spark.range(10000).select(
      (col("id") % 97).as("rk"), ((col("id") * 53) % 5000).as("rt"),
      col("id").as("rid"))
      .groupBy("rk", "rt").agg(max("rid").as("rid"))
    def toSet(df: DataFrame) = df.select($"k", $"t", $"lid", $"rid").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    val smj = toSet(AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt"))
    val bc = toSet(AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt",
      broadcastRight = true))
    assert(smj == bc)
  }

  test("broadcast variant null rules match the sort-merge variant") {
    val l = Seq((Option(1L), Option(10L), "a"), (None, Option(10L), "b"),
      (Option(1L), None, "c")).toDF("k", "t", "lv")
    val r = Seq((Option(1L), Option(5L), "m"), (Option(1L), None, "skip"),
      (None, Option(1L), "nk")).toDF("rk", "rt", "rv")
    val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt",
        broadcastRight = true)
      .select($"lv", $"rv").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    assert(got == Set(("a", Some("m")), ("b", None), ("c", None)))
  }

  test("type mismatches are rejected at construction") {
    intercept[IllegalArgumentException] {
      AsOf.join(leftDf, rightDf.withColumn("rt", $"rt".cast("int")),
        Seq("k"), Seq("rk"), "t", "rt")
    }
    intercept[IllegalArgumentException] {
      AsOf.join(leftDf, rightDf, Seq("k"), Seq("nope"), "t", "rt")
    }
  }
}
