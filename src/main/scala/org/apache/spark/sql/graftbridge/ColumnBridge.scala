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

  /** Release the block-store cache behind a `localCheckpoint`ed frame.
    * `Dataset.unpersist` only consults the CacheManager, which never sees
    * checkpoint RDDs — without this, an iterative loop accumulates every
    * round's materialized blocks until driver GC happens to collect them. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Eager ColumnNode → Catalyst conversion. `expression` returns a LAZY
    * `ColumnNodeExpression` wrapper that only the classic Dataset path
    * unwraps — inside a FunctionRegistry builder it survives to codegen
    * unresolved and blows up. This converter emits the real Catalyst tree
    * (UnresolvedFunction nodes included), which the analyzer then resolves
    * like any parsed SQL. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
