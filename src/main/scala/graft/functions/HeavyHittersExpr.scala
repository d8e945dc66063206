package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `heavy_hitters(col, k) -> array<struct<item:long, est:long>>`: the
  * Misra–Gries frequent-items sketch as a custom
  * TypedImperativeAggregate — the mergeable-summary answer to "which
  * keys dominate this 100 TB column" that exact `GROUP BY` can't give
  * without shuffling every distinct key.
  *
  * State is k counters. `update` is classic MG (hit → increment; room →
  * insert; else decrement ALL counters, dropping zeros). `merge` is the
  * Agarwal-et-al mergeable-summaries rule: sum counters itemwise, then
  * subtract the (k+1)-th largest count from all and keep the positive
  * ones — so partial aggregation applies and each map task ships k
  * (item, count) pairs, never its key space.
  *
  * The GUARANTEES (what the q81 gate pins) are deterministic even
  * though the sketch contents are partition-order-dependent:
  * est ≤ true_freq always (counts only ever under-count), and
  * est ≥ true_freq − n/(k+1) after any merge tree — so every item with
  * true frequency above n/(k+1) is PRESENT. Anything beyond those
  * bounds (exact ranks, exact counts) is not contract and not asserted.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(k > 0, "heavy_hitters: k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long],
      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      val cur = buf.getOrNull(item)
      if (cur != null) buf.update(item, cur + 1L)
      else if (buf.size < k) buf.update(item, 1L)
      else {
        // decrement-all step: every counter pays one, zeros evicted
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (it, c) =>
          if (c == 1L) dead += it else buf.update(it, c - 1L)
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (it, c) =>
      buf.update(it, buf.getOrElse(it, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count, keep the strictly positive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[Long]
      buf.foreachEntry { (it, c) =>
        if (c - cut <= 0L) dead += it else buf.update(it, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val arr = buf.toArray.sortBy { case (it, c) => (-c, it) }
    new GenericArrayData(arr.map { case (it, c) =>
      new GenericInternalRow(Array[Any](it, c))
    })
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (it, c) => bb.putLong(it); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

object HeavyHittersExpr {
  def heavyHitters(col: Column, k: Int): Column =
    bridge.toColumn(
      HeavyHitters(bridge.toExpression(col), k).toAggregateExpression())
}
