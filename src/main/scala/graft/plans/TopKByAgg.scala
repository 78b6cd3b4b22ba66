package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the `k` payload rows with the
  * smallest (`asc = true`) or largest (`asc = false`) `ordering` struct
  * under Catalyst struct ordering, and evaluates to
  * `array<payload-struct>` in rank order (rank 1 first).
  *
  * This is the aggregate the [[RankOneToAggregate]] rewrite targets for
  * `row_number() <= k`: the window form sorts EVERY row of a partition
  * key in one task (the hot-key straggler), while this aggregate is a
  * TypedImperativeAggregate with PARTIAL aggregation — each map task
  * reduces its slice of a key to at most k rows (one bounded-heap
  * insert per row, O(log k) worst case, with an O(1) reject fast path
  * once the heap is full), and the shuffle carries `k x |map tasks|`
  * rows per key instead of all of them. The same bound holds at the
  * merge: buffers never exceed k elements, so memory is O(k) per group
  * regardless of group size.
  *
  * Tie handling matches `row_number` semantics: among order-equal rows
  * an arbitrary one wins (row_number ties are already nondeterministic
  * under Spark's unstable partition sort), so callers needing
  * determinism include a unique tiebreak column — exactly as they must
  * with the window form.
  */
case class TopKByAgg(
    payload: Expression,
    ordering: Expression,
    k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByAgg.Buffer] {

  override def children: Seq[Expression] = Seq(payload, ordering)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    else if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure("payload must be a struct")
    else if (!ordering.dataType.isInstanceOf[StructType] ||
        !org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(ordering.dataType))
      TypeCheckResult.TypeCheckFailure("ordering must be an orderable struct")
    else TypeCheckResult.TypeCheckSuccess

  // Catalyst struct ordering over the order-key values (null field
  // sorts first/smallest — the same semantics min_by/max_by use, and
  // the reason the rewrite only fires for asc-nulls-first /
  // desc-nulls-last windows).
  @transient private lazy val cmp: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ordering.dataType)
      .asInstanceOf[Ordering[Any]]

  override def createAggregationBuffer(): TopKByAgg.Buffer =
    new TopKByAgg.Buffer(k, asc, cmp)

  @transient private lazy val updatePair = new GenericInternalRow(2)

  override def update(buf: TopKByAgg.Buffer, input: InternalRow): TopKByAgg.Buffer = {
    // Normalize through an UnsafeProjection before inserting: eval of a
    // struct expression returns a GenericInternalRow whose copy() is a
    // no-op, and whose string/binary fields may be SLICES of a reused
    // input-row buffer — storing them directly would silently corrupt
    // retained elements when the source row is recycled. The projection
    // output is itself reused, so Buffer.insert still compares first
    // (O(1) reject path, no allocation) and deep-copies only on keep.
    updatePair.update(0, ordering.eval(input))
    updatePair.update(1, payload.eval(input))
    val ur = serProj(updatePair)
    buf.insert(ur.getStruct(0, oFields), ur.getStruct(1, pFields))
    buf
  }

  override def merge(buf: TopKByAgg.Buffer, other: TopKByAgg.Buffer): TopKByAgg.Buffer = {
    other.elems.foreach { case (o, p) => buf.insert(o, p) }
    buf
  }

  override def eval(buf: TopKByAgg.Buffer): Any = {
    val sorted = buf.elems.sortBy(_._1)(if (asc) cmp else cmp.reverse)
    new GenericArrayData(sorted.map(_._2.asInstanceOf[AnyRef]).toArray)
  }

  @transient private lazy val oFields =
    ordering.dataType.asInstanceOf[StructType].length
  @transient private lazy val pFields =
    payload.dataType.asInstanceOf[StructType].length
  @transient private lazy val serProj =
    UnsafeProjection.create(Array(ordering.dataType, payload.dataType))

  override def serialize(buf: TopKByAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val pair = new GenericInternalRow(2)
    buf.elems.foreach { case (o, p) =>
      pair.update(0, o)
      pair.update(1, p)
      val ur = serProj(pair)
      val bytes = ur.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByAgg.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    while (in.available() > 0) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(2)
      row.pointTo(arr, len)
      // Rows point into their own byte slice; still copied by insert.
      buf.insert(row.getStruct(0, oFields), row.getStruct(1, pFields))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(payload = newChildren(0), ordering = newChildren(1))

  override def prettyName: String = "graft_top_k_by"
}

object TopKByAgg {

  /** Bounded heap of (orderKey, payload) InternalRow pairs. The queue
    * dequeues the EVICTION candidate: the largest key when keeping the
    * k smallest (`asc`), the smallest when keeping the k largest. */
  final class Buffer(k: Int, asc: Boolean, cmp: Ordering[Any]) {
    private val evictFirst: Ordering[(Any, Any)] =
      if (asc) Ordering.by[(Any, Any), Any](_._1)(cmp)
      else Ordering.by[(Any, Any), Any](_._1)(cmp.reverse)
    private val queue = mutable.PriorityQueue.empty[(Any, Any)](evictFirst)

    private def better(o: Any, worst: Any): Boolean =
      if (asc) cmp.lt(o, worst) else cmp.gt(o, worst)

    /** Insert, copying the (usually reused) input rows only when the
      * element is actually kept; O(1) reject once the heap is full. */
    def insert(o: Any, p: Any): Unit =
      if (queue.size < k) {
        queue.enqueue((copyOf(o), copyOf(p)))
      } else if (better(o, queue.head._1)) {
        queue.dequeue()
        queue.enqueue((copyOf(o), copyOf(p)))
      }

    private def copyOf(v: Any): Any = v match {
      case r: InternalRow => r.copy()
      case other => other
    }

    def elems: Seq[(Any, Any)] = queue.toSeq
  }
}
