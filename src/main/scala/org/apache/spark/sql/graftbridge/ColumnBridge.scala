package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters — the
  * supported extension-point pattern for libraries shipping custom Catalyst
  * expressions (the converters are package-private in 4.x's split API). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode → Catalyst conversion. `expression` returns a LAZY
    * `ColumnNodeExpression` wrapper that only the classic Dataset path
    * unwraps — inside a FunctionRegistry builder it survives to codegen
    * unresolved and blows up. This converter emits the real Catalyst tree
    * (UnresolvedFunction nodes included), which the analyzer then resolves
    * like any parsed SQL. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
