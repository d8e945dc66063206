package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `max_k(col, k) -> array<double>`: the k largest values per group,
  * descending — a custom TypedImperativeAggregate with a bounded min-heap
  * buffer.
  *
  * Why an aggregate and not a window: `row_number().over(partitionBy…) <=
  * k` materializes and sorts every row of every group; this buffer holds
  * exactly k doubles per group, combines map-side (partial aggregation
  * applies), and ships k values per group across the shuffle. At 100 TB
  * with heavy groups that is the difference between shuffling the table
  * and shuffling k×groups doubles.
  */
case class MaxK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MaxKBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "max_k"

  override def createAggregationBuffer(): MaxKBuffer = new MaxKBuffer(k)

  override def update(buf: MaxKBuffer, input: org.apache.spark.sql.catalyst.InternalRow): MaxKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: MaxKBuffer, other: MaxKBuffer): MaxKBuffer = {
    var i = 0
    while (i < other.size) { buf.offer(other.values(i)); i += 1 }
    buf
  }

  override def eval(buf: MaxKBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map(x => x: Any))

  override def serialize(buf: MaxKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MaxKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MaxKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MaxK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaxK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MaxK =
    copy(child = newChildren.head)
}

/** Bounded min-heap over a flat double array (values(0) = current min once
  * full). */
final class MaxKBuffer(val k: Int) {
  val values = new Array[Double](k)
  var size = 0

  def offer(v: Double): Unit = {
    if (size < k) {
      values(size) = v
      size += 1
      if (size == k) java.util.Arrays.sort(values) // heapify-by-sort once full
    } else if (v > values(0)) {
      // replace min, restore ascending order by insertion (k is small)
      var i = 1
      while (i < k && values(i) < v) { values(i - 1) = values(i); i += 1 }
      values(i - 1) = v
    }
  }

  def sortedDesc: Array[Double] = {
    val out = java.util.Arrays.copyOf(values, size)
    java.util.Arrays.sort(out)
    out.reverse
  }
}

object MaxKExpr {
  def maxK(col: Column, k: Int): Column =
    bridge.toColumn(MaxK(bridge.toExpression(col), k).toAggregateExpression())
}
