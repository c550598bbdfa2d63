package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** l2_normalize(array<float|double>) → array<double>: the vector
  * pre-normalization every similarity query runs, as ONE native
  * codegen'd pass.
  *
  * The higher-order-function formulation — `transform(v, x -> x /
  * sqrt(aggregate(v, 0D, (a, y) -> a + y*y)))` — re-evaluates the
  * norm sub-expression inside the lambda, i.e. O(d²) interpreted
  * lambda steps per ROW (d = 64 ⇒ 4,096 steps/vector before the first
  * pair ever forms). This expression is the O(2d) primitive loop:
  * one squared-sum pass, one division pass.
  *
  * Bit-parity with the lambda (the 225-query hash gate depends on
  * it): the squared sum accumulates in the same element order as
  * `aggregate`'s left fold, float→double widening is exact, sqrt is
  * IEEE-correctly-rounded, and each output element is the same
  * `x / norm` double division — so the produced doubles are
  * bit-identical, including the NaN/Infinity a zero vector yields.
  * A null element yields a NULL result (the defensive posture of
  * [[DotProduct]]) rather than the lambda's all-null array.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "l2_normalize"
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, " +
        s"got ${t.sql}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val vals = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      vals(i) = v
      ss += v * v
      i += 1
    }
    val norm = java.lang.Math.sqrt(ss)
    i = 0
    while (i < n) { vals(i) = vals(i) / norm; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val vals = ctx.freshName("vals")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val v = ctx.freshName("v")
      val rd =
        if (isFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |double[] $vals = new double[$n];
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = $rd;
         |  $vals[$i] = $v;
         |  $ss += $v * $v;
         |}
         |if (!${ev.isNull}) {
         |  double $norm = java.lang.Math.sqrt($ss);
         |  for (int $i = 0; $i < $n; $i++) { $vals[$i] = $vals[$i] / $norm; }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($vals);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): L2Normalize = copy(child = newChild)
}

object L2Normalize {
  def normalize(v: Column): Column =
    Bridge.column(L2Normalize(Bridge.expression(v)))
}
