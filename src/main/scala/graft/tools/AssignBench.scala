package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.queries.SimQueries
import graft.sim.Similarity

/** Assignment-cost crossover measurement: flat center ranking costs
  * O(|centers|·dim) per row, two-level costs
  * O((coarseK + |centers|/coarseK)·dim). At the bench SFs the classic
  * sqrt(n) sizing keeps |centers| small enough that the flat cost is
  * noise — at 100 TB (1e5 centers) it is the dominant term. This tool
  * measures ASSIGNMENT ONLY (rankedCells projection + count, no pair
  * stage) at a caller-chosen center count, so the crossover is a
  * number, not an argument.
  * Usage: runMain graft.tools.AssignBench <sfDir> <centerCount>. */
object AssignBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val v = SimQueries.augmentedVectors(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val n = v.count()
    // Synthetic center matrix: k corpus rows re-identified 0..k-1 (the
    // ranking cost depends only on |centers| and dim, not training).
    val centers = v.limit(k).collect()
      .map(r => r.getSeq[Float](1).toArray)
      .zipWithIndex.map { case (vec, i) => i.toLong -> vec }
    require(centers.length == k, s"corpus too small for $k centers")
    val coarseK = math.max(4, math.sqrt(k.toDouble).round.toInt)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label n=$n k=$k coarseK=$coarseK min=${times.min}%.2f s " +
        s"passes=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    time("flat-broadcast") {
      Similarity.rankedCellsBroadcast(v, centers, 2)
    }
    val idx = Similarity.buildTwoLevelIndex(centers, coarseK)
    time("two-level") {
      Similarity.rankedCellsTwoLevel(v, idx, 2)
    }
    // Partition-quality side of the dispatch trade: the pair stages
    // downstream of either assignment cost O(Σpop²) — a cheaper
    // assignment that degrades the partition can LOSE end-to-end
    // (the sf10 knn_graph_ivf2-vs-flat gap, SCALE.md). One aggregate
    // per path, same center set, so the shape difference is the
    // approximation itself, not training.
    def occupancy(label: String, assigned: org.apache.spark.sql.DataFrame): Unit = {
      val r = assigned.groupBy(col("bucket")).agg(count(lit(1)).as("p"))
        .agg(sum(col("p")).as("n"), count(lit(1)).as("cells"),
          sum(col("p") * col("p")).as("sumsq"), max(col("p")).as("maxpop"))
        .head()
      println(s"$label-occupancy n=${r.getLong(0)} cells=${r.getLong(1)} " +
        s"sumsq=${r.getLong(2)} maxpop=${r.getLong(3)}")
    }
    occupancy("flat", Similarity.assignByCenters(v, centers))
    occupancy("two-level", Similarity.assignByTwoLevel(v, idx))
    spark.stop()
  }
}
