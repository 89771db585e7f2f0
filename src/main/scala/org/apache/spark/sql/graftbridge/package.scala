package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the standard
  * pattern for libraries shipping custom Catalyst expressions without a
  * SparkSessionExtensions registration requirement. */
package object graftbridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Convert a Column to a REAL Catalyst expression tree (not the lazy
    * `ColumnNodeExpression` wrapper [[toExpression]] yields, whose children
    * hide inside the ColumnNode payload where the analyzer's tree traversal
    * cannot resolve them). Required when re-rooting a Column composition
    * under a function-registry builder. */
  def toExpressionTree(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register a temp function into a live session's registry. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
