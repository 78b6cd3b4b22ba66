package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.{TextFunctions => TF}

/** Count-Min sketch aggregate ([[CmsSketchAgg]], `graft_cms_sketch`):
  * the sketch semantics (one-sided error, partition-order invariance,
  * merge = elementwise sum) verified against exact counts. */
class CmsSketchSpec extends SparkSpec {

  import spark.implicits._

  private val depth = 4
  private val width = 16

  private lazy val words =
    Seq.tabulate(500)(i => s"w${i % 23}") ++ Seq.tabulate(100)(i => s"rare$i")

  private def sketchOf(partitions: Int): Seq[Long] =
    words.toDF("tok").repartition(partitions)
      .agg(call_function("graft_cms_sketch", $"tok", lit(depth), lit(width)))
      .as[Seq[Long]].head()

  test("every row of the sketch sums to the total input count") {
    val sk = sketchOf(4)
    assert(sk.length == depth * width)
    (0 until depth).foreach { r =>
      assert(sk.slice(r * width, (r + 1) * width).sum == words.length.toLong,
        s"row $r lost or duplicated counts")
    }
  }

  test("estimates dominate exact counts for EVERY distinct token (one-sided)") {
    val sk = sketchOf(4)
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong)
    val est = words.distinct.map { t =>
      val df = Seq(t).toDF("term")
      val perRow = (0 until depth).map { r =>
        element_at(lit(sk.toArray),
          (lit(r * width + 1) + TF.portableHash($"term", s"cms$r") % width).cast("int"))
      }
      t -> df.select(array_min(array(perRow: _*))).as[Long].head()
    }.toMap
    est.foreach { case (t, e) =>
      assert(e >= exact(t), s"CMS under-counted '$t': est $e < exact ${exact(t)}")
    }
    // The heavy hitters (>= 21 occurrences vs width 16 buckets) must be
    // tracked within the collision noise of the rare tail.
    val heavy = exact.filter(_._2 > 20)
    heavy.foreach { case (t, x) =>
      assert(est(t) - x <= 100, s"'$t' overcounted by ${est(t) - x}")
    }
  }

  test("sketch is invariant to partitioning (merge is lossless)") {
    assert(sketchOf(1) == sketchOf(8))
  }

  test("null inputs are skipped, not counted") {
    val sk = (words.map(Option(_)) ++ Seq.fill(50)(Option.empty[String]))
      .toDF("tok").repartition(3)
      .agg(call_function("graft_cms_sketch", $"tok", lit(depth), lit(width)))
      .as[Seq[Long]].head()
    assert(sk.slice(0, width).sum == words.length.toLong)
  }
}
