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

  /** Wrap a custom logical plan (e.g. [[graft.plans.AsofJoinNode]]) as
    * a DataFrame — the `Dataset.ofRows` door Spark keeps `private[sql]`
    * for exactly this kind of library-operator construction.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
