package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.streaming.operators.stateful.join.StreamingSymmetricHashJoinExec
import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
import org.apache.spark.sql.streaming.StreamingQuery

/** Test-only introspection of a RUNNING streaming query's last executed
  * micro-batch plan (the `private[sql]` door `Bridge` opens for
  * expressions, opened here for physical-plan assertions). Used to pin
  * that stream-stream joins carry STATE-CLEANUP watermarks on both
  * sides — `q.explain()` prints the predicates but can't be asserted
  * on, and nothing in the public API exposes them.
  */
object StreamingPlanProbe {

  /** Physical plan of the query's most recent micro-batch. */
  def executedPlan(q: StreamingQuery): SparkPlan =
    q.asInstanceOf[StreamingQueryWrapper].streamingQuery
      .getLatestExecutionContext().executionPlan.executedPlan

  /** Per stream-stream join in the plan: rendered (left, right) state
    * watermark predicates — `None` on a side means that side's join
    * state is NEVER cleaned up and grows without bound.
    */
  def joinStateWatermarks(q: StreamingQuery): Seq[(Option[String], Option[String])] =
    executedPlan(q).collect {
      case j: StreamingSymmetricHashJoinExec =>
        (j.stateWatermarkPredicates.left.map(_.toString),
          j.stateWatermarkPredicates.right.map(_.toString))
    }
}
