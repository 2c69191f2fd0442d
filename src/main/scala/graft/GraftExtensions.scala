package graft

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** graft's `SparkSessionExtensions` hook: registers the native
  * expressions with the session FunctionRegistry, so SQL users get them
  * too — `spark.sql("SELECT vec_dot(a, b) ...")` — not just the Column
  * API in [[graft.functions.VectorFunctions]].
  *
  * Wire up with `spark.sql.extensions=graft.GraftExtensions` (done by
  * [[GraftSession.tuned]]) or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "vec_dot(arrayA, arrayB) takes 2 arguments")
        DotProduct(children.head, children(1))
      }))
  }
}
