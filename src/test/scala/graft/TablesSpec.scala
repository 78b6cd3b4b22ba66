package graft

/** [[Tables.spread]]'s r19 scale-adaptive contract: rebalance ONLY an
  * under-parallel source. At bench SFs every table is one parquet
  * split, so spread still fires exactly as before (zero local plan
  * change); at real scale the input already arrives in >= width
  * splits and the former unconditional repartition was a corpus-sized
  * exchange bought for nothing. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def width: Int =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  test("spread widens an under-parallel frame to the session width") {
    val narrow = (1L to 100L).toDF("id").coalesce(1)
    assert(narrow.rdd.getNumPartitions < width)
    val s = Tables.spread(narrow)
    assert(s.rdd.getNumPartitions == width)
    assert(s.count() == 100L)
  }

  test("spread is the identity on an already-wide frame (no exchange)") {
    val wide = (1L to 100L).toDF("id").repartition(width + 3)
    val s = Tables.spread(wide)
    // Same frame: no second exchange added — had spread fired, the
    // width would have collapsed to the session width.
    assert(s.rdd.getNumPartitions == width + 3)
    assert(s.count() == 100L)
  }

  test("spread preserves the row multiset either way") {
    val got: Seq[Long] = Tables.spread((1L to 57L).toDF("id").coalesce(1))
      .as[Long].collect().toSeq.sorted
    assert(got == (1L to 57L).toSeq)
  }
}
