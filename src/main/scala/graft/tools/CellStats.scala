package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.queries.SimQueries
import graft.sim.{KMeans, Similarity}

/** Cell-population diagnostics for the IVF assignment variants: the
  * in-cell pair stage costs Σ pop² — this prints that sum, the max
  * cell, and the cell count for the FLAT sqrt(n) assignment vs the
  * TWO-LEVEL coarse→fine assignment on the augmented corpus, so the
  * flat-vs-two-level trade (assignment compute vs cell balance) is
  * measured, not guessed. Usage: runMain graft.tools.CellStats <sfDir>. */
object CellStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val v = SimQueries.augmentedVectors(spark, dir)
    val centers = KMeans.fitCenters(v, 0L until SimQueries.sqrtCells(v), iters = 1)
    def stats(label: String, assigned: org.apache.spark.sql.DataFrame): Unit = {
      val pops = assigned.groupBy(col("bucket")).agg(count(lit(1)).as("p"))
      val r = pops.agg(count(lit(1)).as("cells"), max(col("p")).as("maxp"),
        sum(col("p") * col("p")).as("sumsq")).head()
      println(s"$label cells=${r.getLong(0)} max=${r.getLong(1)} sumsq=${r.getLong(2)}")
    }
    stats("flat", Similarity.assignByCenters(v, centers))
    val coarseK = math.max(4, math.sqrt(centers.length.toDouble).round.toInt)
    val idx = Similarity.buildTwoLevelIndex(centers, coarseK)
    stats("two-level", Similarity.rankedCellsTwoLevel(v, idx, 1))
    val gsz = idx.groups.values.map(_.ids.length).toSeq.sorted
    println(s"coarseK=$coarseK groups=${gsz.size} groupSizes min=${gsz.min} " +
      s"median=${gsz(gsz.size / 2)} max=${gsz.max}")
    spark.stop()
  }
}
