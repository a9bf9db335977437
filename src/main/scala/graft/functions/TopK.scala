package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded-state per-group top-k aggregate: keeps the `k` SMALLEST
  * values of `child` (any orderable type — wrap (order, payload) in a
  * struct with the order fields first) and returns them sorted
  * ascending.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY
  * key ORDER BY ...) <= k` SORTS AND SHUFFLES EVERY ROW and serializes
  * each hot key into one task — at corpus scale a skewed group becomes
  * the straggler. As a [[TypedImperativeAggregate]] this runs with
  * map-side partial aggregation: each input partition reduces every
  * group it sees to at most k values BEFORE the exchange, the shuffle
  * carries ≤ k·partitions rows per group, and no per-group sort of the
  * full data ever happens. The buffer is a size-capped binary heap —
  * update is O(log k) against the CURRENT WORST element, so a stream
  * of already-filtered rows costs one comparison each.
  *
  * The heap is a max-heap on the interpreted ordering (head = worst
  * survivor); values are copied on insert (Catalyst reuses row
  * buffers) and spill-serialized through an [[UnsafeProjection]] so
  * any child type — including structs carrying a row payload —
  * round-trips partial aggregation exactly.
  */
case class TopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(Array(child.dataType))

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    else TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(child.dataType, false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ord) // max-heap: head = worst kept

  private def insert(
      buf: mutable.PriorityQueue[Any], v: Any): mutable.PriorityQueue[Any] = {
    if (buf.size < k) buf += v
    else if (ord.lt(v, buf.head)) { buf.dequeue(); buf += v }
    buf
  }

  override def update(
      buf: mutable.PriorityQueue[Any], input: InternalRow)
      : mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v == null) buf
    else insert(buf, InternalRow.copyValue(v)) // rows/strings are reused
  }

  override def merge(
      buf: mutable.PriorityQueue[Any], other: mutable.PriorityQueue[Any])
      : mutable.PriorityQueue[Any] = {
    other.foreach(insert(buf, _)) // already-copied values
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ord))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { v =>
      val rowBytes = proj(InternalRow(v)).getBytes
      out.writeInt(rowBytes.length)
      out.write(rowBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      buf += InternalRow.copyValue(row.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopK =
    copy(child = newChild)
}

object TopK {

  /** Aggregate Column keeping the k smallest `e` values, sorted
    * ascending. For top-k LARGEST order by a negated key (or wrap in a
    * struct whose leading fields invert the sense).
    */
  def topK(e: Column, k: Int): Column =
    GraftBridge.column(
      TopK(GraftBridge.expression(e), k).toAggregateExpression())
}
