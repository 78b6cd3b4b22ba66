package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, CreateStruct}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** [[TopKByAgg]] buffer mechanics (bound, merge, serde round-trip) and
  * the registered `graft_top_k_by` SQL surface. The end-to-end
  * partial-aggregation path is exercised by the rewrite tests in
  * [[RankOneToAggregateSpec]] and by the `source_cap` oracle query. */
class TopKByAggSpec extends SparkSpec {
  import spark.implicits._

  // payload = struct(s: string), ordering = struct(o: int), over an
  // input row (s, o).
  private def fn(k: Int, asc: Boolean) = TopKByAgg(
    CreateStruct(Seq(BoundReference(0, org.apache.spark.sql.types.StringType, true))),
    CreateStruct(Seq(BoundReference(1, org.apache.spark.sql.types.IntegerType, true))),
    k, asc)

  private def row(s: String, o: Int): InternalRow =
    InternalRow(UTF8String.fromString(s), o)

  private def values(agg: TopKByAgg, buf: TopKByAgg.Buffer): Seq[String] =
    agg.eval(buf).asInstanceOf[GenericArrayData].array.toSeq
      .map(_.asInstanceOf[InternalRow].getUTF8String(0).toString)

  test("buffer keeps at most k elements, in rank order at eval") {
    val agg = fn(3, asc = false)
    val buf = agg.createAggregationBuffer()
    Seq("a" -> 1, "b" -> 9, "c" -> 5, "d" -> 7, "e" -> 3, "f" -> 8)
      .foreach { case (s, o) => agg.update(buf, row(s, o)) }
    assert(buf.elems.size == 3, "bounded heap must never exceed k")
    assert(values(agg, buf) == Seq("b", "f", "d"), "desc keeps largest, rank order")

    val ascAgg = fn(2, asc = true)
    val ascBuf = ascAgg.createAggregationBuffer()
    Seq("a" -> 4, "b" -> 2, "c" -> 9, "d" -> 1)
      .foreach { case (s, o) => ascAgg.update(ascBuf, row(s, o)) }
    assert(values(ascAgg, ascBuf) == Seq("d", "b"), "asc keeps smallest")
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val agg = fn(4, asc = false)
    val buf = agg.createAggregationBuffer()
    Seq("x" -> 10, "y" -> 30, "z" -> 20).foreach { case (s, o) =>
      agg.update(buf, row(s, o)) }
    val back = agg.deserialize(agg.serialize(buf))
    assert(values(agg, back) == values(agg, buf))
    assert(values(agg, back) == Seq("y", "z", "x"))
  }

  test("merge respects the bound and keeps the global top-k") {
    val agg = fn(2, asc = false)
    val a = agg.createAggregationBuffer()
    Seq("a1" -> 1, "a2" -> 8).foreach { case (s, o) => agg.update(a, row(s, o)) }
    val b = agg.createAggregationBuffer()
    Seq("b1" -> 9, "b2" -> 2, "b3" -> 7).foreach { case (s, o) =>
      agg.update(b, row(s, o)) }
    agg.merge(a, b)
    assert(a.elems.size == 2)
    assert(values(agg, a) == Seq("b1", "a2"), "global top-2 across partials")
  }

  test("empty buffer evaluates to an empty array") {
    val agg = fn(3, asc = true)
    val buf = agg.createAggregationBuffer()
    assert(agg.eval(buf).asInstanceOf[GenericArrayData].numElements() == 0)
    // and round-trips
    assert(agg.deserialize(agg.serialize(buf)).elems.isEmpty)
  }

  test("graft_top_k_by SQL function aggregates per group in rank order") {
    Seq(("g1", "a", 3), ("g1", "b", 1), ("g1", "c", 7), ("g1", "d", 5),
        ("g2", "e", 2))
      .toDF("g", "s", "o").createOrReplaceTempView("topk_in")
    val out = spark.sql(
      """SELECT g, transform(
        |  graft_top_k_by(named_struct('s', s), named_struct('o', o), 2, false),
        |  x -> x.s) AS top
        |FROM topk_in GROUP BY g""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("g1") == Seq("c", "d"))
    assert(out("g2") == Seq("e"))
  }
}
