package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `count_min(col, depth, width) -> array<long>` (row-major depth×width
  * counters): the Count-Min sketch as a custom TypedImperativeAggregate —
  * the mergeable point-frequency summary complementing q81's Misra–Gries
  * (MG surfaces WHICH keys dominate; CMS answers "how often is key x"
  * for ANY x in O(depth), with one-sided error).
  *
  * CMS is LINEAR: a counter's value is the exact sum of colliding items'
  * counts, independent of arrival or merge order — `merge` is elementwise
  * addition, partial aggregation applies untouched, and (unlike MG) the
  * sketch CONTENT is deterministic, so q86 oracle-checks the estimates
  * exactly by replaying the hash collisions in SQL. Guarantees:
  * est(x) ≥ true(x) always; est(x) ≤ true(x) + ε·N with probability
  * 1−δ for depth = ln(1/δ), width = e/ε (the probabilistic half is per
  * hash draw, hence not asserted — the deterministic lower bound and the
  * exact replay are).
  *
  * Hashes are `((x mod P)·a_d + b_d) mod P mod width` with P = 2³¹−1 and
  * a_d, b_d < 2³¹ — products stay under 2⁶² so the SAME arithmetic runs
  * overflow-free in DuckDB (no wrapping int64 there; a murmur-style
  * mixer would not be restatable).
  */
case class CountMin(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= CountMinExpr.A.length,
    s"count_min: depth must be in [1, ${CountMinExpr.A.length}]")
  require(width > 0, "count_min: width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buf(d * width + CountMinExpr.bucket(item, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMin =
    copy(child = newChildren.head)
}

object CountMinExpr {
  /** 2³¹−1 (prime); hash constants stay below 2³¹ so (x mod P)·a < 2⁶². */
  val P: Long = 2147483647L
  val A: Array[Long] = Array(654435761L, 1000003L, 999983L)
  val B: Array[Long] = Array(12345L, 67890L, 424242L)

  /** Row-d bucket of item — shared by the aggregate and the query side. */
  def bucket(item: Long, d: Int, width: Int): Int =
    ((java.lang.Math.floorMod(item, P) * A(d) + B(d)) % P % width).toInt

  def countMin(col: Column, depth: Int, width: Int): Column =
    bridge.toColumn(
      CountMin(bridge.toExpression(col), depth, width)
        .toAggregateExpression())

  /** Column-level point query: min over rows of the probed counter.
    * `sketch` is the aggregate's array<long>; `item` a non-negative
    * integral column. Pure builtin arithmetic — stays in codegen and is
    * restated verbatim by the DuckDB oracle. */
  def cmsQuery(sketch: Column, item: Column, depth: Int,
      width: Int): Column = {
    import org.apache.spark.sql.functions._
    val ests = (0 until depth).map { d =>
      val j = pmod(pmod(item, lit(P)) * lit(A(d)) + lit(B(d)), lit(P)) % width
      element_at(sketch, (lit(d * width) + j + 1).cast("int"))
    }
    least(ests: _*)
  }
}
