package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: makes the engine's custom expressions
  * visible to plain SQL in any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`). The function list is the
  * SAME one the temp-function registry uses
  * ([[graft.functions.ArrayExpressions.functionBuilders]]) — one place
  * to add an expression, both SQL surfaces get it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.SessionizePlan.SessionizeStrategy)
    graft.functions.ArrayExpressions.functionBuilders.foreach {
      case (name, className, builder) =>
        e.injectFunction((
          FunctionIdentifier(name), new ExpressionInfo(className, name), builder))
    }
  }
}
