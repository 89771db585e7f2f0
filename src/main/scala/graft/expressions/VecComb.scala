package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native elementwise array combine (`a - b` / `a + b` → array<double>) —
  * bit-identical to the `zip_with(a, b, (x, y) => x.cast("double") ± y)`
  * composition it replaces (zip_with extends to the longer input and any
  * missing/null element yields a null element), but a single static-kernel
  * pass with no interpreted `LambdaFunction` island: the IVF-RQ residual /
  * reconstruction projections stay inside whole-stage codegen.
  */
case class VecCombExpr(left: Expression, right: Expression, subtract: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (subtract) "graft_vec_sub" else "graft_vec_add"

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<float|double>, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.combine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right), subtract)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.GraftVec.combine($a, $b, " +
        s"${isFloat(left)}, ${isFloat(right)}, $subtract);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCombExpr =
    copy(left = newLeft, right = newRight)
}

object VecCombExpr {
  import org.apache.spark.sql.graftbridge

  def sub(a: Column, b: Column): Column =
    graftbridge.toColumn(VecCombExpr(graftbridge.toExpression(a),
      graftbridge.toExpression(b), subtract = true))

  def add(a: Column, b: Column): Column =
    graftbridge.toColumn(VecCombExpr(graftbridge.toExpression(a),
      graftbridge.toExpression(b), subtract = false))
}
