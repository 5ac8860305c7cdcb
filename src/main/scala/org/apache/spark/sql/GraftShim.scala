package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst-Expression bridge for graft's native expressions.
  * `classic.ExpressionUtils` is `private[sql]`, so this one-file shim in
  * the org.apache.spark.sql package exposes exactly the two conversions —
  * the standard pattern Spark extension libraries use to lift custom
  * `Expression`s (with codegen) into the public Column algebra. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
