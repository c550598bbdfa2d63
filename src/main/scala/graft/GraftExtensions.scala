package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering the engine's custom Catalyst
  * expressions as SQL functions — the `SparkSessionExtensions` injection
  * point, enabled via `spark.sql.extensions=graft.GraftExtensions`
  * (set by [[Sessions.local]]). `SELECT fnv1a(key)` then plans the
  * codegen'd expression directly, no UDF wrapper.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv1a"),
      new ExpressionInfo(
        classOf[graft.functions.Fnv1aHash].getName, "fnv1a"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "fnv1a takes exactly one argument")
        // cast like the Column helper does — without it a non-string
        // argument passes analysis and dies in codegen/eval
        graft.functions.Fnv1aHash(org.apache.spark.sql.catalyst.expressions
          .Cast(children.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.L2Normalize].getName, "l2_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "l2_normalize takes exactly one argument")
        graft.functions.L2Normalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(
        classOf[graft.functions.DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product takes exactly two arguments")
        graft.functions.DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("gram_clip"),
      new ExpressionInfo(
        classOf[graft.functions.GramClip].getName, "gram_clip"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "gram_clip takes exactly three arguments")
        graft.functions.GramClip(children.head, children(1), children(2))
      }))
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // internal runtime-filter rewrite but does not register them as SQL
    // functions; exposing them lets a pipeline build an explicit bloom
    // prefilter (q77) — the manual form of the same broadcast-a-sketch
    // pattern InjectRuntimeFilter plans automatically.
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "bloom_filter_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, n)
        case Seq(c, n, b) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg takes 1-3 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "might_contain takes exactly two arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
    // scale guard: holistic percentile → bounded sort-based plan
    ext.injectOptimizerRule(_ => graft.plans.ScaleSafePercentiles)
    // whole-operator extension: native backward as-of join (merge-scan
    // exec behind graft.plans.AsofJoinPlan / Asof.join)
    ext.injectPlannerStrategy(_ => graft.plans.AsofStrategy)
  }
}
