package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout (`etl/Layout`): Morton-curve bit interleave
  * correctness vs a reference implementation, and a measured
  * file-skipping proof — the z-ordered layout must let a predicate on
  * the SECOND dimension prune files that a first-dimension linear sort
  * cannot. */
class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave, scalar Scala. */
  private def morton(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = vals.size
    for (b <- 0 until bits; i <- 0 until n)
      z |= ((vals(i) >> b) & 1L) << (b * n + i)
    z
  }

  test("zValue matches the scalar reference interleave") {
    import spark.implicits._
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == morton(Seq(x, y), 4), s"($x,$y)")
    }
  }

  test("zValue is injective over the scaled grid (no bucket collisions)") {
    import spark.implicits._
    val pts = for (x <- 0L until 32L; y <- 0L until 32L; w <- 0L until 4L)
      yield (x, y, w)
    val distinct = pts.toDF("x", "y", "w")
      .select(Layout.zValue(Seq(col("x"), col("y"), col("w")), 5).as("z"))
      .distinct().count()
    assert(distinct == pts.size)
  }

  test("scaleToBits clamps outliers and covers the full bucket range") {
    import spark.implicits._
    val vals = Seq(-100.0, 0.0, 50.0, 100.0, 900.0).toDF("v")
      .select(Layout.scaleToBits(col("v"), 0.0, 100.0, 4).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(vals == Seq(0L, 0L, 7L, 15L, 15L))
  }

  test("file-skipping: z-order prunes on the second dimension, linear sort cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    val linearPath = new java.io.File(dir, "linear").getAbsolutePath
    val zPath = new java.io.File(dir, "zorder").getAbsolutePath
    val numFiles = 8

    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val okMax = li.agg(max("l_orderkey")).head.getLong(0).toDouble
    val pkMax = li.agg(max("l_partkey")).head.getLong(0).toDouble

    // Linear layout: range-partitioned + sorted by l_orderkey only —
    // the best possible layout for orderkey predicates, blind to
    // partkey.
    li.repartitionByRange(numFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linearPath)
    // Z-ordered on (orderkey, partkey).
    Layout.zOrder(li, Seq(
        Layout.scaleToBits(col("l_orderkey"), 0, okMax, 12),
        Layout.scaleToBits(col("l_partkey"), 0, pkMax, 12)),
      bits = 12, numFiles = numFiles)
      .write.mode("overwrite").parquet(zPath)

    // A file can be skipped for predicate `l_partkey <= c` iff its
    // footer min(l_partkey) > c — the same min/max test parquet
    // readers run against row-group stats.
    def filesOverlapping(path: String, cutoff: Double): Int = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == numFiles)
      files.count { f =>
        val mn = spark.read.parquet(f.getAbsolutePath)
          .agg(min("l_partkey")).head.getLong(0)
        mn <= cutoff
      }
    }
    val cutoff = pkMax * 0.2
    val linearHit = filesOverlapping(linearPath, cutoff)
    val zHit = filesOverlapping(zPath, cutoff)
    // Linear-by-orderkey scatters partkey uniformly: every file's min
    // is ~0, nothing skips. The z-order curve gives partkey locality,
    // so the bottom-20% predicate must skip at least a third of files.
    assert(linearHit == numFiles,
      s"expected the linear layout to prune nothing, pruned ${numFiles - linearHit}")
    assert(zHit <= numFiles - 3,
      s"expected z-order to skip >= 3 of $numFiles files, hit $zHit")
  }
}
