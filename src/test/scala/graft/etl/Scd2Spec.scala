package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** SCD Type 2 historization (`etl/Scd2.historize`): episode collapse,
  * null-safe change detection, interval chaining, is_current. */
class Scd2Spec extends SparkSpec {

  private def obs(rows: Seq[(Long, Long, String)]) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))), schema)
  }

  private def historize(rows: Seq[(Long, Long, String)]) =
    Scd2.historize(obs(rows), keys = Seq("id"), tracked = Seq("v"),
        orderCols = Seq("seq"), validCol = "seq")
      .orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))

  test("consecutive repeats collapse into one episode") {
    val h = historize(Seq((1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"),
      (1L, 4L, "b"), (1L, 5L, "a")))
    assert(h.toSeq == Seq(
      (1L, "a", 1L, 3L, false),
      (1L, "b", 3L, 5L, false),
      (1L, "a", 5L, -1L, true)))
  }

  test("null -> null is NOT a change; null <-> value IS") {
    val h = historize(Seq((1L, 1L, null), (1L, 2L, null), (1L, 3L, "x"),
      (1L, 4L, null)))
    assert(h.toSeq == Seq(
      (1L, null, 1L, 3L, false),
      (1L, "x", 3L, 4L, false),
      (1L, null, 4L, -1L, true)))
  }

  test("a genuinely-null FIRST value still opens the first episode") {
    val h = historize(Seq((1L, 1L, null), (1L, 2L, "a")))
    assert(h.length == 2 && h.head._2 == null && h.head._3 == 1L)
  }

  test("exactly one is_current per key; intervals chain without gaps") {
    val rows = for {
      id <- 1L to 20L; seq <- 1L to 10L
    } yield (id, seq, s"v${(seq * id) % 3}")
    val h = historize(rows)
    val byKey = h.groupBy(_._1)
    byKey.values.foreach { eps =>
      assert(eps.count(_._5) == 1)
      assert(eps.last._5 && eps.last._4 == -1L)
      // valid_to of episode i == valid_from of episode i+1
      eps.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3)
        case _ => ()
      }
    }
  }

  test("asOf returns exactly the value in force at the probe point") {
    import org.apache.spark.sql.functions.lit
    val hist = Scd2.historize(
      obs(Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), (2L, 25L, "z"))),
      Seq("id"), Seq("v"), Seq("seq"), "seq")
    def at(t: Long): Seq[(Long, String)] =
      Scd2.asOf(hist, lit(t)).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(at(5) == Seq.empty)                      // before any history
    assert(at(10) == Seq((1L, "a")))                // inclusive valid_from
    assert(at(19) == Seq((1L, "a")))
    assert(at(20) == Seq((1L, "b")))                // exclusive valid_to
    assert(at(27) == Seq((1L, "b"), (2L, "z")))
    assert(at(99) == Seq((1L, "c"), (2L, "z")))     // open episodes match forever
    // Exactly one row per covered key at every probe point.
    (10L to 40L).foreach { t =>
      assert(at(t).map(_._1).distinct.size == at(t).size, s"dup at $t")
    }
  }

  test("multiple tracked columns: a change in ANY opens an episode") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 1L, "x", "p"), Row(1L, 2L, "x", "q"), Row(1L, 3L, "x", "q"),
      Row(1L, 4L, "y", "q"))), schema)
    val h = Scd2.historize(df, Seq("id"), Seq("a", "b"), Seq("seq"), "seq")
      .orderBy("valid_from").collect()
    assert(h.map(_.getLong(3)).toSeq == Seq(1L, 2L, 4L)) // valid_from
  }
}
