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
    leftTime: Expression, rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression)
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
                  matchRow = rBuf.next().copy()
                } else advance = false
              } else advance = false
            }
          }
          val r =
            if (matchKey != null && keyOrd.compare(matchKey, k) == 0) matchRow
            else nullRight
          toUnsafe(joined(lRow, r))
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
  * row (SQL semantics). */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
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
    bridge.ofRows(spark, AsOfJoin(lPlan, rPlan, lk, rk, lt, rt))
  }
}
