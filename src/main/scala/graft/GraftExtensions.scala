package graft

import graft.functions.{CosineSim, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

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
    // whole-operator extension: the native as-of join (logical node →
    // planner strategy → physical merge operator)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "vec_dot(arrayA, arrayB) takes 2 arguments")
        // cast inputs so vec_dot(embedding, ...) on array<float> columns
        // is correct (getDouble over float elements would read garbage);
        // non-castable inputs fail analysis instead of crashing at runtime
        DotProduct(Cast(children.head, ArrayType(DoubleType)),
          Cast(children(1), ArrayType(DoubleType)))
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "cosine_sim(arrayA, arrayB) takes 2 arguments")
        // same auto-cast discipline as vec_dot: array<float> embeddings
        // are the common input, and getDouble over floats reads garbage
        CosineSim(Cast(children.head, ArrayType(DoubleType)),
          Cast(children(1), ArrayType(DoubleType)))
      }))
  }
}
