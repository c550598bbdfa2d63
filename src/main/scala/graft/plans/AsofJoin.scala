package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftglue.Bridge

/** Native backward as-of join — the whole-operator extension path
  * ((c) in SURVEY §7.3): a custom LogicalPlan + SparkStrategy +
  * SparkPlan, registered through `GraftExtensions.injectPlannerStrategy`.
  *
  * Semantics (inner, backward): for each left row, the LATEST right row
  * with the same key whose time is <= the left row's time; left rows
  * with no such match drop. Spark has no ASOF join operator (the
  * composed form is q29's per-key window); this exec IS the merge-scan
  * that composition simulates:
  *
  *   - `requiredChildDistribution` co-partitions both sides on the key
  *     (ClusteredDistribution — the join's ONLY shuffles, exactly like
  *     a shuffled hash/merge join);
  *   - `requiredChildOrdering` asks the planner for (key, time) sorts —
  *     Spark's external sort, so nothing is buffered in memory;
  *   - `doExecute` zips co-partitions and runs a single forward
  *     merge-scan holding ONE candidate right row, so per-task state is
  *     O(1) regardless of how many right rows precede a left row
  *     (the window form materializes the running struct per row).
  *
  * At 100 TB: one shuffle per side, two external sorts, constant-memory
  * probe — the plan shape stays identical at any click:error ratio.
  * Ties on (key, time) resolve to the last row in sort order; pass a
  * total-order time (e.g. a (time, id) STRUCT — struct ordering is
  * positional) when tie determinism matters.
  */
final case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil,
    SortOrder(rightKey, Ascending) :: SortOrder(rightTime, Ascending) :: Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, leftAttrs ++ rightAttrs)
      // ONE buffered candidate + one lookahead row: the whole probe state
      var cand: InternalRow = null
      var candKey: Any = null
      var pending: InternalRow = null
      lIter.flatMap { lrow =>
        val lk = lKeyB.eval(lrow)
        val lt = lTimeB.eval(lrow)
        if (lk == null || lt == null) Iterator.empty
        else {
          // a candidate held over from a previous (smaller) key is stale
          if (cand != null && keyOrd.compare(candKey, lk) != 0) cand = null
          var scanning = true
          while (scanning) {
            if (pending == null && rIter.hasNext)
              pending = rIter.next().copy() // shuffle rows are reused
            if (pending == null) scanning = false
            else {
              val rk = rKeyB.eval(pending)
              val rt = rTimeB.eval(pending)
              if (rk == null || rt == null) pending = null
              else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) pending = null // behind every remaining left key
                else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                  cand = pending; candKey = rk; pending = null
                } else scanning = false // ahead of this left row: stop
              }
            }
          }
          if (cand != null) Iterator.single(proj(joined(lrow, cand)))
          else Iterator.empty
        }
      }
    }
  }
}

/** User-facing entry: backward as-of inner join by column name. The two
  * inputs must be independent plans (re-read the table for a self-join
  * so attribute ids differ).
  */
object Asof {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output}"))
    val (lk, rk) = (attr(lp, leftKey), attr(rp, rightKey))
    val (lt, rt) = (attr(lp, leftTime), attr(rp, rightTime))
    // the merge-scan compares left values against right values with the
    // LEFT side's ordering, so the sides must agree structurally (field
    // names may differ — struct comparison is positional)
    def sameShape(a: org.apache.spark.sql.types.DataType,
        b: org.apache.spark.sql.types.DataType) =
      org.apache.spark.sql.types.DataType.equalsStructurally(
        a, b, ignoreNullability = true)
    require(sameShape(lk.dataType, rk.dataType),
      s"key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(sameShape(lt.dataType, rt.dataType),
      s"time types differ: ${lt.dataType} vs ${rt.dataType}")
    Bridge.ofRows(left.sparkSession, AsofJoinPlan(lp, rp, lk, rk, lt, rt))
  }
}
