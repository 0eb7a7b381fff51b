package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extensions entry point: makes graft's native functions
  * available in ANY session without code changes —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftSparkExtensions ...
  * // then: SELECT graft_qdot(a, b) FROM ...
  * }}}
  *
  * Programmatic sessions can equivalently call
  * `GraftFunctions.register(spark)` (the `graft.ext` operators do so
  * themselves). This is the standard injection point for the engine's
  * custom Catalyst surface; parser/rule/strategy injections would go
  * here too if an operator ever needs one (none does today —
  * SURVEY.md §4.3).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[graft.functions.LongArrayDot].getName, name),
        builder))
    }
}
