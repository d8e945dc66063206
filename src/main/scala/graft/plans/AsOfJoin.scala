package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.bridge

/** As-of (point-in-time) join as a first-class operator:
  * LogicalPlan node → Strategy → sort-merge SparkPlan.
  *
  * Semantics: left outer as-of — every left row is matched with the right
  * row sharing its key that has the greatest `rightTime <= leftTime`
  * (ties on time impossible if the right side is unique per (key, time);
  * otherwise the last row in sort order wins, deterministically).
  *
  * Execution: both sides hash-partition on the key (ClusteredDistribution;
  * Catalyst's EnsureRequirements inserts the exchanges + sorts), each
  * partition is consumed with a single forward merge — O(n log n) in the
  * sort, O(n) in the merge, no windowed state, no per-row probing. This is
  * the plan a 1000-executor cluster wants: one co-partitioned shuffle per
  * side and a streaming merge, versus the union-sort-window trick
  * (`Relational.q17AsofJoin`) which funnels both sides through one window
  * operator per key with last-value state.
  *
  * The reference has no as-of join; this covers the "absent join kinds"
  * capability row of SURVEY §2.3 with the preferred custom-operator tier
  * (c) from the build brief.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String = "backward", tolerance: Long = -1L)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String = "backward", tolerance: Long = -1L)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val schema = output
    // typed orderings — keys/times of any orderable type, not just LONG
    val keyOrd = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(leftKey.dataType)
    val timeOrd = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(leftTime.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val toUnsafe = UnsafeProjection.create(schema, schema)
      val rBuf = rIter.buffered

      var matchKey: Any = null // non-null iff matchRow holds a candidate
      var matchRow: InternalRow = null
      var matchTime: Any = null
      val dirB = direction == "backward"
      val dirF = direction == "forward"
      // times eval to Long/Int/Short/Byte for integral, timestamp (µs
      // long) and date (days int) types — the only types the API admits
      // when a numeric distance is needed (forward/nearest/tolerance)
      def tl(v: Any): Long = v match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
        case s: java.lang.Short => s.toLong
        case b: java.lang.Byte => b.toLong
        case o => o.asInstanceOf[Number].longValue
      }

      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        // SQL semantics: a NULL key or time matches nothing (emit the
        // null-extended row without touching the cursor — null-keyed rows
        // sort first, so no later left row needs anything they'd consume)
        if (k == null || t == null) toUnsafe(joined(lRow, nullRight))
        else {
          // advance the right cursor through all rows with
          // (rkey < k) or (rkey == k && rtime <= t); remember the last
          // one whose key == k — both sides are (key, time)-sorted, and
          // left times are non-decreasing within a key, so the cursor
          // never needs to back up. Right rows with NULL key/time sort
          // first and are skipped (they can match nothing).
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rKey.eval(head)
            if (hk == null) { rBuf.next() }
            else {
              val c = keyOrd.compare(hk, k)
              if (c < 0) { rBuf.next() }
              else if (c == 0) {
                val ht = rTime.eval(head)
                if (ht == null) { rBuf.next() }
                else if (timeOrd.compare(ht, t) <= 0) {
                  matchKey = k
                  matchTime = ht
                  matchRow = rBuf.next().copy()
                } else advance = false
              } else advance = false
            }
          }
          val prevOk = matchKey != null && keyOrd.compare(matchKey, k) == 0
          def within(rt: Any): Boolean =
            tolerance < 0 || math.abs(tl(t) - tl(rt)) <= tolerance
          // forward candidate: the last CONSUMED row when it sits exactly
          // at t (ties at t belong to both directions; among equal times
          // the last in sort order wins, matching backward's tie rule),
          // else the unconsumed head — the first right row strictly after
          // t, which the cursor only PEEKS so later left rows keep it
          var nextRow: InternalRow = null
          var nextTime: Any = null
          if (!dirB) {
            if (prevOk && timeOrd.compare(matchTime, t) == 0) {
              nextRow = matchRow; nextTime = matchTime
            } else if (rBuf.hasNext) {
              val h = rBuf.head
              val hk = rKey.eval(h)
              if (hk != null && keyOrd.compare(hk, k) == 0) {
                nextRow = h; nextTime = rTime.eval(h)
              }
            }
          }
          val chosen: InternalRow =
            if (dirB) {
              if (prevOk && within(matchTime)) matchRow else nullRight
            } else if (dirF) {
              if (nextRow != null && within(nextTime)) nextRow else nullRight
            } else { // nearest: closer side within tolerance, tie → backward
              val pd = if (prevOk && within(matchTime))
                math.abs(tl(t) - tl(matchTime)) else Long.MaxValue
              val nd = if (nextRow != null && within(nextTime))
                math.abs(tl(nextTime) - tl(t)) else Long.MaxValue
              if (pd == Long.MaxValue && nd == Long.MaxValue) nullRight
              else if (pd <= nd) matchRow else nextRow
            }
          toUnsafe(joined(lRow, chosen))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public API: as-of join two DataFrames on key and time columns of any
  * orderable type (int/long/string/timestamp/...). Key and time types must
  * match between the two sides; NULL keys/times join to the null-extended
  * row (SQL semantics).
  *
  * `direction` (the pandas `merge_asof` trio, all on the SAME one-pass
  * sort-merge cursor): "backward" = greatest rightTime ≤ leftTime (the
  * default and the only direction that admits arbitrary orderable time
  * types); "forward" = least rightTime ≥ leftTime; "nearest" = smaller
  * |rightTime − leftTime|, ties to the backward row. `tolerance` ≥ 0
  * null-extends matches farther than that many time units. Forward/
  * nearest/tolerance need a NUMERIC time distance, so they require an
  * integral, timestamp, or date time column. Exact-tie rule throughout:
  * among equal rightTimes the last row in sort order wins. */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      direction: String = "backward", tolerance: Long = -1L): DataFrame = {
    val spark = leftDf.sparkSession
    // idempotently register the planner strategy on this session
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = bridge.analyzed(leftDf)
    val rPlan = bridge.analyzed(rightDf)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: $leftKey is ${lk.dataType.sql}, " +
        s"$rightKey is ${rk.dataType.sql} — cast one side")
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: $leftTime is ${lt.dataType.sql}, " +
        s"$rightTime is ${rt.dataType.sql} — cast one side")
    // orderability check up front (throws a clear error for e.g. MAP keys)
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(lk.dataType)
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(lt.dataType)
    require(Set("backward", "forward", "nearest")(direction),
      s"as-of direction '$direction' — use backward, forward, or nearest")
    if (direction != "backward" || tolerance >= 0L) {
      import org.apache.spark.sql.types._
      val numericTime = Seq(LongType, IntegerType, ShortType, ByteType,
        TimestampType, TimestampNTZType, DateType).contains(lt.dataType)
      require(numericTime,
        s"as-of direction '$direction'/tolerance needs a numeric time " +
          s"distance; ${lt.dataType.sql} time columns support backward only")
    }
    bridge.ofRows(spark, AsOfJoin(lPlan, rPlan, lk, rk, lt, rt,
      direction, tolerance))
  }
}
