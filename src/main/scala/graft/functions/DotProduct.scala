package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** dot_product(array<double>, array<double>) → double.
  *
  * A native codegen'd Catalyst expression for the ANN hot path: Spark's
  * higher-order functions (`aggregate`/`zip_with` lambdas) are
  * interpreted per element, which dominates all-pairs similarity (128M
  * lambda steps for 2M pairs × 64 dims ≈ 12s at sf0.1). The generated
  * code is a tight primitive loop over ArrayData — same sequential
  * multiply-add order, so results are bit-identical to the lambda fold
  * (and to the DuckDB oracle's list_sum).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // NULL on malformed input (length mismatch / null element) rather
  // than a silently-truncated plausible value — so the result is
  // nullable even when both children are not.
  override def nullable: Boolean = true

  // Element types are fixed at analysis time; reading a float vector
  // with getDouble would throw deep inside the parquet reader, so both
  // float and double arrays are supported natively and anything else is
  // rejected up front.
  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  private def get(e: Expression, a: ArrayData, i: Int): Double =
    if (elemType(e).contains(FloatType)) a.getFloat(i).toDouble
    else a.getDouble(i)

  // Mismatched lengths or a null element yield NULL — never a
  // truncated/garbage sum (ArrayData.getDouble on a null slot returns
  // whatever is in the backing buffer).
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += get(left, x, i) * get(right, y, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def rd(e: Expression, v: String): String =
        if (elemType(e).contains(FloatType)) s"(double) $v.getFloat($i)"
        else s"$v.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${rd(left, x)} * ${rd(right, y)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
