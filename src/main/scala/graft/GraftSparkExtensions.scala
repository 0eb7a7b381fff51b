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
  * themselves). Also injects the [[GraftSqlParser]], adding the
  * flagship statement `SCHEMA DIFF ('base', 'target') [LANG ko]` to
  * the session's SQL surface (everything else delegates to Spark's
  * parser).
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[graft.functions.LongArrayDot].getName, name),
        builder))
    }
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    // point-in-interval joins -> binned equi-joins, opt-in via
    // spark.graft.rangeJoin.binWidth (see graft.plans.RangeJoinRule)
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRule(session))
    // whole-operator as-of join (AsOfJoinPlan -> AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
