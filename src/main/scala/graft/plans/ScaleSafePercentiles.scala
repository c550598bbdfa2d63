package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

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
  * Scope: every `percentile(col, lit)` call must have frequency 1, no
  * DISTINCT/FILTER, a scalar literal fraction, and a deterministic
  * numeric value expression; grouping expressions must be plain
  * attributes. Percentiles may appear INSIDE arbitrary output
  * expressions (`round(percentile(x, 0.5), 6)`) and alongside other
  * aggregates (`count`, `sum`, …) — the non-percentile aggregates ride
  * along unchanged over the windowed rows, which carry exactly the
  * original row multiset. Anything out of scope leaves the Aggregate
  * untouched (correctness over coverage).
  *
  * Null handling matches `percentile`'s skip-nulls contract without a
  * filter (which would lose all-null groups): nulls sort LAST, so
  * non-null ranks stay 1..n with n = count(value) — an all-null or
  * empty group interpolates through null arithmetic to null.
  *
  * Registered through `GraftExtensions` (injectOptimizerRule); exclude
  * via `spark.sql.optimizer.excludedRules` to compare against the
  * holistic plan (the spec does exactly that).
  */
object ScaleSafePercentiles extends Rule[LogicalPlan] {

  private def eligible(ae: AggregateExpression): Option[(Expression, Double)] =
    ae match {
      case AggregateExpression(p: Percentile, Complete | Final, false, None, _)
          if p.child.dataType.isInstanceOf[NumericType] &&
            p.child.deterministic =>
        (p.percentageExpression, p.frequencyExpression) match {
          case (Literal(f: Double, DoubleType), IntegerLiteral(1)) =>
            Some((p.child, f))
          case (Literal(f: Double, DoubleType), Literal(1L, LongType)) =>
            Some((p.child, f))
          case _ => None
        }
      case _ => None
    }

  private def hasPercentile(e: Expression): Boolean =
    e.exists(_.isInstanceOf[Percentile])

  /** Ride-along aggregates must be input-order-INSENSITIVE: the rewrite
    * feeds them rows re-sorted by the rank windows, so an order-
    * sensitive aggregate (first/last/collect_list, sketches with
    * order-dependent merge) would silently change its answer vs the
    * holistic plan. Whitelist of commutative aggregates only.
    *
    * Caveat (accepted): Sum/Average over floating-point columns are
    * commutative only up to IEEE rounding — the rewrite's re-sort changes
    * accumulation order, so a double sum can drift by ~1 ulp vs the
    * holistic plan. The repo-wide determinism posture (round(…, 6/9)
    * before any cross-engine or cross-plan compare — SURVEY §8.6) absorbs
    * this; bit-exact parity would require restricting the whitelist to
    * exact types (integral/decimal Sum, Min/Max/Count, bit/bool aggs).
    */
  private def orderInsensitive(ae: AggregateExpression): Boolean =
    ae.deterministic && (ae.aggregateFunction match {
      case _: Min | _: Max | _: Count | _: Sum | _: Average |
           _: BitAndAgg | _: BitOrAgg | _: BitXorAgg |
           _: BoolAnd | _: BoolOr => true
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groups, aggExprs, child, _)
        if groups.forall(_.isInstanceOf[Attribute]) &&
          aggExprs.exists(hasPercentile) =>
      // every AggregateExpression that CONTAINS a Percentile must be an
      // eligible standalone percentile call, or we leave the plan alone
      val aggCalls = aggExprs.flatMap(_.collect {
        case ae: AggregateExpression => ae
      })
      val pctls = aggCalls.filter(hasPercentile)
      val parsed = pctls.map(eligible)
      val others = aggCalls.filterNot(hasPercentile)
      if (parsed.exists(_.isEmpty) || !others.forall(orderInsensitive)) agg
      else rewrite(groups.map(_.asInstanceOf[Attribute]), aggExprs,
        pctls.zip(parsed.map(_.get)), others, child)
  }

  private def d(e: Expression): Expression = Cast(e, DoubleType)

  private def rewrite(groups: Seq[Attribute],
      aggExprs: Seq[NamedExpression],
      pctls: Seq[(AggregateExpression, (Expression, Double))],
      others: Seq[AggregateExpression],
      child: LogicalPlan): LogicalPlan = {
    // one ranked value column per distinct percentile value expression
    val distinctVals = pctls.map(_._2._1).foldLeft(Seq.empty[Expression]) {
      (acc, v) => if (acc.exists(_.semanticEquals(v))) acc else acc :+ v
    }
    val vAliases = distinctVals.zipWithIndex.map { case (v, i) =>
      Alias(d(v), s"__pctl_v$i")()
    }
    def idxFor(v: Expression): Int =
      distinctVals.indexWhere(_.semanticEquals(v))
    val projected = Project(child.output ++ vAliases, child)

    // rank window per value column + per-value non-null count windows,
    // all sharing the grouping partition (one exchange; the Window
    // nodes stack). Nulls sort LAST so non-null ranks are dense from 1.
    val rowFrame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
      CurrentRow)
    val fullFrame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
      UnboundedFollowing)
    var windowed: LogicalPlan = projected
    val rnAliases = vAliases.map { va =>
      val order = SortOrder(va.toAttribute, Ascending, NullsLast, Seq.empty)
      val spec = WindowSpecDefinition(groups, Seq(order), rowFrame)
      val rn = Alias(WindowExpression(RowNumber(), spec), s"__pctl_rn")()
      windowed = Window(Seq(rn), groups, Seq(order), windowed)
      rn
    }
    val nAliases = vAliases.map { va =>
      Alias(WindowExpression(
        AggregateExpression(Count(va.toAttribute), Complete,
          isDistinct = false),
        WindowSpecDefinition(groups, Nil, fullFrame)), "__pctl_n")()
    }
    windowed = Window(nAliases, groups, Nil, windowed)

    // boundary-row picks (two per percentile call) + per-value counts;
    // non-percentile aggregates ride along over the same rows
    def pos(f: Double, n: Expression): Expression =
      Multiply(Literal(f, DoubleType), d(Subtract(n, Literal(1L))))
    def pick(cond: Expression, v: Attribute): Expression =
      AggregateExpression(Max(If(cond, v, Literal(null, DoubleType))),
        Complete, isDistinct = false)
    val picks = pctls.zipWithIndex.map { case ((_, (v, f)), i) =>
      val vi = idxFor(v)
      val rn = Cast(rnAliases(vi).toAttribute, LongType)
      val va = vAliases(vi).toAttribute
      val po = pos(f, nAliases(vi).toAttribute)
      (Alias(pick(EqualTo(rn, Add(Floor(po), Literal(1L))), va),
        s"__pctl_lo$i")(),
        Alias(pick(EqualTo(rn, Add(Ceil(po), Literal(1L))), va),
          s"__pctl_hi$i")())
    }
    val nOuts = distinctVals.indices.map { i =>
      Alias(AggregateExpression(Max(nAliases(i).toAttribute), Complete,
        isDistinct = false), "__pctl_nmax")()
    }
    val otherAliases = others.zipWithIndex.map { case (ae, i) =>
      Alias(ae, s"__pctl_agg$i")()
    }
    val agg2 = Aggregate(groups,
      groups ++ otherAliases ++ picks.flatMap(p => Seq(p._1, p._2)) ++ nOuts,
      windowed)

    // substitute: each percentile call → its interpolation over the
    // boundary picks; each other aggregate → its agg2 attribute. Output
    // names AND exprIds are preserved so parent plans still resolve.
    def interp(i: Int): Expression = {
      val (v, f) = pctls(i)._2
      val lo = picks(i)._1.toAttribute
      val hi = picks(i)._2.toAttribute
      val po = pos(f, nOuts(idxFor(v)).toAttribute)
      If(EqualTo(Floor(po), Ceil(po)), lo,
        Add(Multiply(Subtract(d(Ceil(po)), po), lo),
          Multiply(Subtract(po, d(Floor(po))), hi)))
    }
    val outCols: Seq[NamedExpression] = aggExprs.map {
      case a: Attribute => a
      case al @ Alias(body, name) =>
        val rebuilt = body.transformUp {
          case ae: AggregateExpression =>
            val pi = pctls.indexWhere(_._1 eq ae)
            if (pi >= 0) interp(pi)
            else otherAliases(others.indexWhere(_ eq ae)).toAttribute
        }
        Alias(rebuilt, name)(exprId = al.exprId)
      case other => other
    }
    Project(outCols, agg2)
  }
}
