package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversion,
  * used by graft operators that build Catalyst expressions directly
  * (e.g. the row-value expression filter's attribute re-scoping).
  * Lives in the org.apache.spark.sql package for access, by design —
  * the standard pattern for Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
