package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Durations

/** The duration DSL (SURVEY F6) as a SQL-callable expression:
  * `graft_duration_seconds('2days 5hours')` → 190800. Unparseable input
  * yields NULL (SQL-idiomatic; the reference's total-function 0 fallback
  * is `coalesce(graft_duration_seconds(x), 0)`). */
case class DurationSecondsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // unparseable input ⇒ NULL
  override def prettyName: String = "graft_duration_seconds"

  override def nullSafeEval(input: Any): Any =
    Durations.parse(input.asInstanceOf[UTF8String].toString)
      .map(Long.box).orNull

  override protected def withNewChildInternal(newChild: Expression): DurationSecondsExpr =
    copy(child = newChild)
}
