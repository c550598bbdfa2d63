package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer guard: rewrites Spark's holistic `percentile` aggregate
  * into the bounded sort-based formulation (window rank + boundary-row
  * interpolation — the same shape as `graft.queries.Q.exactPercentiles`).
  *
  * Why: `Percentile` buffers EVERY group value in one aggregation
  * buffer — the round-1 q34 finding was ~600M doubles in a single
  * buffer at 100× scale, an OOM rather than a slowdown. The rewritten
  * plan ranks rows through Spark's external (spilling) window sort and
  * aggregates only the two boundary rows per requested fraction, so
  * per-task memory is bounded at any group size. Exact same semantics:
  * position p·(n−1), linear interpolation between the floor/ceil ranks.
  *
  * Scope (bails out otherwise — correctness over coverage):
  *   - every aggregate in the Aggregate is `percentile(col, lit)` with
  *     frequency 1, no DISTINCT/FILTER, scalar literal fraction;
  *   - the value expression is numeric and deterministic;
  *   - grouping expressions are plain attributes.
  *
  * Null handling matches `percentile`'s skip-nulls contract without a
  * filter (which would lose all-null groups): nulls sort LAST, so
  * non-null ranks stay 1..n with n = count(value) — an all-null or
  * empty group interpolates through null arithmetic to null.
  *
  * Registered through `GraftExtensions` (injectOptimizerRule), so any
  * `spark.sql("… percentile(x, 0.5) …")` on a graft session plans the
  * scale-safe shape automatically; exclude via
  * `spark.sql.optimizer.excludedRules` to compare against the holistic
  * plan (the spec does exactly that).
  */
object ScaleSafePercentiles extends Rule[LogicalPlan] {

  /** (value expression, fraction, output alias) of an eligible call. */
  private case class P(value: Expression, fraction: Double, alias: Alias)

  private def eligible(ae: AggregateExpression): Option[(Expression, Double)] =
    ae match {
      case AggregateExpression(
          p: Percentile, Complete | Final, false, None, _) =>
        (p.percentageExpression, p.frequencyExpression) match {
          case (Literal(f: Double, DoubleType), IntegerLiteral(1)) =>
            Some((p.child, f))
          case (Literal(f: Double, DoubleType), Literal(1L, LongType)) =>
            Some((p.child, f))
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groups, aggExprs, child, _)
        if groups.forall(_.isInstanceOf[Attribute]) &&
          aggExprs.exists(_.exists(_.isInstanceOf[Percentile])) =>
      // collect per output column: either a pass-through grouping attr
      // or an eligible percentile; anything else → bail (None)
      val classified: Option[Seq[Either[NamedExpression, P]]] =
        traverse(aggExprs.map {
          case a: Attribute if groups.exists(_.semanticEquals(a)) =>
            Some(scala.util.Left(a))
          case al @ Alias(ae: AggregateExpression, _) =>
            eligible(ae).collect {
              case (v, f) if v.dataType.isInstanceOf[
                  org.apache.spark.sql.types.NumericType] && v.deterministic =>
                scala.util.Right(P(v, f, al))
            }
          case _ => None
        })
      classified match {
        case Some(cols) if cols.exists(_.isRight) =>
          rewrite(groups.map(_.asInstanceOf[Attribute]),
            cols, child, agg)
        case _ => agg
      }
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  private def d(e: Expression): Expression = Cast(e, DoubleType)

  private def rewrite(groups: Seq[Attribute],
      cols: Seq[Either[NamedExpression, P]],
      child: LogicalPlan, original: Aggregate): LogicalPlan = {
    val ps = cols.collect { case scala.util.Right(p) => p }
    // one ranked value column per distinct value expression
    val distinctVals = ps.map(_.value).foldLeft(Seq.empty[Expression]) {
      (acc, v) => if (acc.exists(_.semanticEquals(v))) acc else acc :+ v
    }
    val vAliases = distinctVals.zipWithIndex.map { case (v, i) =>
      Alias(d(v), s"__pctl_v$i")()
    }
    def vAttrFor(v: Expression): Attribute = {
      val i = distinctVals.indexWhere(_.semanticEquals(v))
      vAliases(i).toAttribute
    }
    val projected = Project(child.output ++ vAliases, child)

    // rank window per value column + one count window, all sharing the
    // grouping partition (one exchange; Spark stacks the Window nodes)
    val rowFrame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
      CurrentRow)
    val fullFrame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
      UnboundedFollowing)
    var windowed: LogicalPlan = projected
    val rnAliases = vAliases.map { va =>
      // nulls LAST keeps non-null ranks dense from 1 (percentile skips
      // nulls); rank windows and count windows share one partitioning
      val order = SortOrder(va.toAttribute, Ascending, NullsLast, Seq.empty)
      val spec = WindowSpecDefinition(groups, Seq(order), rowFrame)
      val rn = Alias(WindowExpression(RowNumber(), spec), s"__pctl_rn")()
      windowed = Window(Seq(rn), groups, Seq(order), windowed)
      rn
    }
    def rnAttrFor(v: Expression): Attribute =
      rnAliases(distinctVals.indexWhere(_.semanticEquals(v))).toAttribute
    // per-value non-null counts (Count(v) skips nulls, like percentile)
    val nAliases = vAliases.map { va =>
      Alias(WindowExpression(
        AggregateExpression(Count(va.toAttribute), Complete,
          isDistinct = false),
        WindowSpecDefinition(groups, Nil, fullFrame)), "__pctl_n")()
    }
    windowed = Window(nAliases, groups, Nil, windowed)
    def nAttrFor(v: Expression): Attribute =
      nAliases(distinctVals.indexWhere(_.semanticEquals(v))).toAttribute

    // boundary-row picks: only the floor/ceil-rank rows survive the agg
    def pos(f: Double, n: Expression): Expression =
      Multiply(Literal(f, DoubleType), d(Subtract(n, Literal(1L))))
    def pick(cond: Expression, v: Attribute): Expression =
      AggregateExpression(Max(If(cond, v, Literal(null, DoubleType))),
        Complete, isDistinct = false)
    val picks = ps.zipWithIndex.flatMap { case (p, i) =>
      val rn = Cast(rnAttrFor(p.value), LongType)
      val v = vAttrFor(p.value)
      val po = pos(p.fraction, nAttrFor(p.value))
      Seq(
        Alias(pick(EqualTo(rn, Add(Floor(po), Literal(1L))), v),
          s"__pctl_lo$i")(),
        Alias(pick(EqualTo(rn, Add(Ceil(po), Literal(1L))), v),
          s"__pctl_hi$i")())
    }
    val nOuts = distinctVals.map { v =>
      Alias(AggregateExpression(Max(nAttrFor(v)), Complete,
        isDistinct = false), "__pctl_nmax")()
    }
    val agg2 = Aggregate(groups, groups ++ picks ++ nOuts, windowed)

    // interpolate, restoring each original output name AND exprId
    def nFinalFor(v: Expression): Attribute =
      nOuts(distinctVals.indexWhere(_.semanticEquals(v))).toAttribute
    var pi = -1
    val outCols: Seq[NamedExpression] = cols.map {
      case scala.util.Left(g) => g
      case scala.util.Right(p) =>
        pi += 1
        val lo = picks(2 * pi).toAttribute
        val hi = picks(2 * pi + 1).toAttribute
        val po = pos(p.fraction, nFinalFor(p.value))
        val interp = If(EqualTo(Floor(po), Ceil(po)), lo,
          Add(Multiply(Subtract(d(Ceil(po)), po), lo),
            Multiply(Subtract(po, d(Floor(po))), hi)))
        Alias(interp, p.alias.name)(exprId = p.alias.exprId)
    }
    Project(outCols, agg2)
  }
}
