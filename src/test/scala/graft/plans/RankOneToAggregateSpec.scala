package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[RankOneToAggregate]]: the row_number()=1 window idiom must compile
  * to a max_by/min_by aggregate — same rows, same schema, same
  * downstream resolution — and must NOT fire outside its guards. */
class RankOneToAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: DataFrame = Seq(
    ("a", 3, 30L), ("a", 1, 10L), ("a", 2, 20L),
    ("b", 7, 70L), ("b", 9, 90L),
    ("c", 5, 50L)
  ).toDF("k", "o", "v")

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst { case w: LWindow => w }.nonEmpty

  private def aggFns(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate =>
      a.aggregateExpressions.flatMap(_.collect {
        case AggregateExpression(_: MaxBy, _, _, _, _) => "max_by"
        case AggregateExpression(_: MinBy, _, _, _, _) => "min_by"
      })
    }.flatten

  private def windowRankOne(df: DataFrame, desc: Boolean): DataFrame = {
    val w = Window.partitionBy($"k")
      .orderBy(if (desc) $"o".desc_nulls_last else $"o")
    df.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
  }

  test("desc rewrites to max_by and keeps the per-key latest row") {
    val q = windowRankOne(fixture, desc = true)
    assert(!hasWindow(q), "Window node must be rewritten away")
    assert(aggFns(q) == Seq("max_by"))
    assert(q.orderBy($"k").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      == Seq(("a", 3), ("b", 9), ("c", 5)))
  }

  test("asc rewrites to min_by and keeps the per-key earliest row") {
    val q = windowRankOne(fixture, desc = false)
    assert(!hasWindow(q))
    assert(aggFns(q) == Seq("min_by"))
    assert(q.orderBy($"k").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      == Seq(("a", 1), ("b", 7), ("c", 5)))
  }

  test("rewrite is observation-equivalent with NULL sort keys (both defaults)") {
    val df = Seq(
      ("a", Option(3), 1L), ("a", None, 2L), ("a", Option(5), 3L),
      ("b", None, 4L), ("b", None, 5L)
    ).toDF("k", "o", "id")
    for (desc <- Seq(true, false)) {
      val w = Window.partitionBy($"k")
        .orderBy(if (desc) $"o".desc_nulls_last else $"o".asc_nulls_first)
      val q = df.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).drop("rn")
      assert(!hasWindow(q), s"desc=$desc")
      val got = q.orderBy($"k").collect()
        .map(r => (r.getString(0), Option(r.get(1)))).toSeq
      // desc nulls last -> 5 wins for a; asc nulls first -> null wins.
      val want =
        if (desc) Seq(("a", Some(5)), ("b", None))
        else Seq(("a", None), ("b", None))
      assert(got == want, s"desc=$desc")
    }
  }

  test("rank attribute referenced downstream resolves to literal 1") {
    val w = Window.partitionBy($"k").orderBy($"o".desc_nulls_last)
    val q = fixture.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(!hasWindow(q))
    assert(q.select($"rn").distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("extra filter conjuncts survive above the rewrite") {
    val w = Window.partitionBy($"k").orderBy($"o".desc_nulls_last)
    val q = fixture.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"v" > 40L).drop("rn")
    assert(!hasWindow(q))
    assert(q.orderBy($"k").collect().map(_.getString(0)).toSeq == Seq("b", "c"))
  }

  test("rewritten output joins back to its source (exprId integrity)") {
    val q = windowRankOne(fixture, desc = true)
      .select($"k", $"o".as("latest_o"))
    val joined = fixture.join(q, "k").filter($"o" === $"latest_o")
    assert(joined.count() == 3)
  }

  test("global top-1 (empty partitionBy) rewrites too") {
    val w = Window.orderBy($"o".desc_nulls_last)
    val q = fixture.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(!hasWindow(q))
    assert(q.collect().map(_.getInt(1)).toSeq == Seq(9))
  }

  test("global top-1 over EMPTY input returns zero rows, not a null row") {
    // A global aggregate over empty input emits one row (max_by -> null);
    // the window form emits none. The rewrite must filter that row out.
    val w = Window.orderBy($"o".desc_nulls_last)
    val q = fixture.filter($"v" > 1000L)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    assert(!hasWindow(q), "rewrite must still fire on the empty-input plan")
    assert(q.collect().isEmpty, "empty input must yield zero rows, not null row")
    // Grouped form on empty input stays empty too (no guard needed there).
    val wg = Window.partitionBy($"k").orderBy($"o".desc_nulls_last)
    val qg = fixture.filter($"v" > 1000L)
      .withColumn("rn", row_number().over(wg)).filter($"rn" === 1).drop("rn")
    assert(!hasWindow(qg) && qg.collect().isEmpty)
  }

  test("guards: rank(), non-prefix slice, huge k, mixed directions, multi-window do not fire") {
    val wd = Window.partitionBy($"k").orderBy($"o".desc_nulls_last)
    val rankQ = fixture.withColumn("rn", rank().over(wd))
      .filter($"rn" === 1).drop("rn")
    assert(hasWindow(rankQ), "rank() must not rewrite (ties keep >1 row)")

    val slice = fixture.withColumn("rn", row_number().over(wd))
      .filter($"rn" === 2).drop("rn")
    assert(hasWindow(slice), "rank = 2 keeps a non-prefix slice; must not rewrite")

    val hugeK = fixture.withColumn("rn", row_number().over(wd))
      .filter($"rn" <= 1000000).drop("rn")
    assert(hasWindow(hugeK), "k beyond rewriteTopKMaxK must keep the window plan")

    val mixed = fixture.withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"o".desc_nulls_last, $"v")))
      .filter($"rn" === 1).drop("rn")
    assert(hasWindow(mixed), "mixed sort directions must not rewrite")

    val ascNullsLast = fixture.withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"o".asc_nulls_last)))
      .filter($"rn" === 1).drop("rn")
    assert(hasWindow(ascNullsLast), "asc nulls last must not rewrite")

    val multi = fixture
      .withColumn("rn", row_number().over(wd))
      .withColumn("mx", max($"v").over(Window.partitionBy($"k")))
      .filter($"rn" === 1)
    assert(hasWindow(multi), "extra window expressions must not rewrite")
  }

  private def hasTopKAgg(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case a: Aggregate if a.aggregateExpressions.exists(_.collectFirst {
        case AggregateExpression(_: TopKByAgg, _, _, _, _) => ()
      }.nonEmpty) => a
    }.nonEmpty

  test("row_number <= k rewrites to the bounded-heap TopKByAgg aggregate") {
    val w = Window.partitionBy($"k").orderBy($"o".desc_nulls_last)
    val q = fixture.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(!hasWindow(q), "Window node must be rewritten away")
    assert(hasTopKAgg(q), "plan must aggregate through TopKByAgg")
    val got = q.orderBy($"k", $"rn")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(3))).toSeq
    assert(got == Seq(
      ("a", 3, 1), ("a", 2, 2), ("b", 9, 1), ("b", 7, 2), ("c", 5, 1)))
  }

  test("top-k asc keeps the k smallest with ranks reconstructed") {
    val w = Window.partitionBy($"k").orderBy($"o")
    val q = fixture.withColumn("rn", row_number().over(w)).filter($"rn" < 3)
    assert(!hasWindow(q) && hasTopKAgg(q))
    val got = q.orderBy($"k", $"rn")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(3))).toSeq
    assert(got == Seq(
      ("a", 1, 1), ("a", 2, 2), ("b", 7, 1), ("b", 9, 2), ("c", 5, 1)))
  }

  test("top-k global (empty partitionBy) works, and empty input yields zero rows") {
    val w = Window.orderBy($"o".desc_nulls_last)
    val q = fixture.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(!hasWindow(q) && hasTopKAgg(q))
    assert(q.orderBy($"rn").collect().map(_.getInt(1)).toSeq == Seq(9, 7))
    // Global aggregate over EMPTY input emits one row with an empty
    // array; the non-outer explode must drop it.
    val empty = fixture.filter($"v" > 1000L)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(!hasWindow(empty) && empty.collect().isEmpty)
  }

  test("top-k with string payload survives row-buffer reuse (deep copies)") {
    // 1000 distinct strings through a 2-partition scan: if the buffer
    // retained slices of reused input rows, values would collide.
    val df = spark.range(1000).select(
      (col("id") % 5).as("k"), concat(lit("s"), col("id")).as("s"),
      col("id").as("o"))
    val w = Window.partitionBy($"k").orderBy($"o".desc_nulls_last)
    val q = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
    assert(!hasWindow(q) && hasTopKAgg(q))
    val got = q.select($"k", $"s", $"rn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val want = (0L until 5L).flatMap { k =>
      val ids = (0L until 1000L).filter(_ % 5 == k).sorted.reverse.take(3)
      ids.zipWithIndex.map { case (id, i) => (k, s"s$id", i + 1) }
    }.toSet
    assert(got == want)
  }

  test("top-k agrees with the un-rewritten window plan on a 10k-row frame") {
    val df = spark.range(10000).select(
      (col("id") % 97).as("k"),
      ((col("id") * 31) % 1009).as("o"),
      col("id").as("v"))
    val w = Window.partitionBy($"k").orderBy($"o".desc_nulls_last, $"v".desc_nulls_last)
    def run() = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val rewritten = run()
    spark.conf.set(RankOneToAggregate.ConfKey, "false")
    val plain = try run() finally spark.conf.set(RankOneToAggregate.ConfKey, "true")
    assert(rewritten == plain)
  }

  test("several rank bounds AND-ed take the tightest") {
    val w = Window.partitionBy($"k").orderBy($"o".desc_nulls_last)
    val q = fixture.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2 && $"rn" <= 1 && $"v" > 0L)
    assert(!hasWindow(q))
    // tightest bound is 1 -> max_by path, one row per key
    assert(aggFns(q) == Seq("max_by"))
    assert(q.count() == 3)
  }

  test("conf kill-switch restores the window plan") {
    spark.conf.set(RankOneToAggregate.ConfKey, "false")
    try {
      val q = windowRankOne(fixture, desc = true)
      assert(hasWindow(q))
      assert(q.count() == 3)
    } finally spark.conf.set(RankOneToAggregate.ConfKey, "true")
  }

  test("agrees with the un-rewritten window plan on a 10k-row frame") {
    val df = spark.range(10000).select(
      (col("id") % 97).as("k"),
      ((col("id") * 31) % 1009).as("o"),
      col("id").as("v"))
    val w = Window.partitionBy($"k").orderBy($"o".desc_nulls_last, $"v".desc_nulls_last)
    def run() = df.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rewritten = run()
    spark.conf.set(RankOneToAggregate.ConfKey, "false")
    val plain = try run() finally spark.conf.set(RankOneToAggregate.ConfKey, "true")
    assert(rewritten == plain)
  }
}
