package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway graft needs: turning a hand-built
  * [[LogicalPlan]] (e.g. [[graft.plans.AsOfJoinPlan]]) into a
  * DataFrame. Spark offers no public constructor for this — every
  * extension library that contributes whole logical operators ships
  * the same bridge. Nothing else from the private API is touched.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to the session. */
  def addStrategy(spark: SparkSession, s: org.apache.spark.sql.classic.Strategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }

  /** Catalyst Expression → public Column (and back) — needed when a
    * transformation requires an expression Spark exposes no function
    * for (e.g. a Cast pinned to an explicit time zone instead of the
    * session zone).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Idempotently add an optimizer rule to the session — the runtime
    * (public-API) alternative to `SparkSessionExtensions
    * .injectOptimizerRule` for sessions built without extensions.
    */
  def addOptimization(
      spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.exists(_.ruleName == r.ruleName))
      cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ r
  }
}
