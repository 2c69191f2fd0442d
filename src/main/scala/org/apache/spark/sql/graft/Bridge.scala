package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one `private[sql]`-bridging shim graft needs: build a `Column`
  * from a custom Catalyst `Expression` (and back). Spark 4 moved this
  * behind `org.apache.spark.sql.classic.ExpressionUtils`; the supported
  * extension route for libraries adding native expressions is a small
  * file in the `org.apache.spark.sql` namespace — everything else in
  * graft stays on public API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
