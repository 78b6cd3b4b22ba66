package graft.expressions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_cms_sketch(token, depth, width)` — Count-Min sketch
  * (Cormode & Muthukrishnan 2005) as a TypedImperativeAggregate:
  * `depth x width` BIGINT counters, each input string incrementing one
  * counter per row at column `h_r(s) = md5Prefix60("cms<r>:" + s) %
  * width`. Evaluates to the flattened `array<bigint>` (row-major), so
  * the point estimate for a term is `min over r of
  * sketch[r * width + h_r(term)]` — computable relationally from the
  * sketch row, and replayable exactly in the DuckDB oracle because the
  * hash is the library's portable salted-md5 prefix
  * ([[graft.text.TextFunctions.portableHash]] with salt `cms<r>`;
  * a production deployment would swap in a cheaper murmur here at the
  * cost of oracle replayability).
  *
  * This is the fixed-size answer to "token frequencies over 100 TB":
  * the exact `groupBy(token).count` shuffles the full distinct
  * vocabulary, while this sketch is O(depth x width) per map task —
  * partial aggregation reduces every input slice to one 2 KB-scale
  * counter array, the shuffle carries one buffer per task, and merge
  * is elementwise addition (commutative, associative, lossless w.r.t.
  * the sketch semantics). The estimate's guarantee is one-sided:
  * `est >= exact` always, `est <= exact + eps * N` with probability
  * `1 - delta` for `width = ceil(e / eps)`, `depth = ceil(ln(1/delta))`.
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (depth < 1 || width < 1)
      TypeCheckResult.TypeCheckFailure(
        s"depth and width must be >= 1, got ($depth, $width)")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cms_sketch expects a string column, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  // One salt prefix per hash row, pre-encoded ("cms0:", "cms1:", ...)
  // so update hashes raw bytes with zero per-call string allocation.
  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(depth)(r => s"cms$r:".getBytes)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      var r = 0
      while (r < depth) {
        val h = Md5Hashing.prefixLong(Md5Hashing.md5Salted(salts(r), s))
        buf(r * width + (h % width).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_cms_sketch"
}
