package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the `private[sql]` plan-construction surface of Spark 4's
  * classic API — the whole-operator counterpart of
  * [[GraftExpressionBridge]]: libraries that add custom logical
  * operators need `Dataset.ofRows` to wrap a hand-built [[LogicalPlan]]
  * as a DataFrame, and a place to register the planner strategy that
  * lowers it. Same public extension-library pattern as the expression
  * bridge.
  */
object GraftPlanBridge {

  /** Wrap a logical plan as a DataFrame (runs the normal analyzer /
    * optimizer / planner pipeline over it). */
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Catalyst predicate → V1 `sources.Filter`, exactly the planner's
    * own translation (`DataSourceStrategy.translateFilter`, which is
    * `protected[sql]`): lets an analysis rule predict whether a
    * predicate will reach `SupportsDelete.canDeleteWhere` translated,
    * so its partition-drop-vs-row-level routing can never disagree
    * with the planner. */
  def translateFilter(predicate: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    execution.datasources.DataSourceStrategy
      .translateFilter(predicate, supportNestedPredicatePushdown = true)

  /** Re-bind `df` to a CLONE of its session with `kvs` conf overrides
    * applied — the race-free way to scope a write-time conf change to
    * one job: setting the shared session's conf and restoring it would
    * leak the change to every concurrent job in the window. The clone
    * shares the SparkContext (and the cache); only its SQLConf and
    * derived session state diverge, and it is dropped with the
    * returned frame. */
  def withSessionConf(df: DataFrame, kvs: (String, String)*): DataFrame = {
    val clone = sessionWithConf(df.sparkSession, kvs: _*)
    classic.Dataset.ofRows(clone.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)
  }

  /** A session CLONE with `kvs` conf overrides — for running one SQL
    * statement under a scoped conf (e.g. partitionOverwriteMode)
    * without mutating the shared session out from under concurrent
    * jobs. The clone shares the SparkContext, cache, and (by
    * inheritance) catalog/temp-view registrations. */
  def sessionWithConf(spark: SparkSession,
      kvs: (String, String)*): SparkSession = {
    val clone = spark.asInstanceOf[classic.SparkSession].cloneSession()
    kvs.foreach { case (k, v) => clone.conf.set(k, v) }
    clone
  }

  /** Idempotently add a planner strategy to the session (the public
    * `experimental.extraStrategies` hook; cluster deployments would use
    * `SparkSessionExtensions.injectPlannerStrategy` instead). */
  def ensureStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy)) {
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ strategy
    }
  }

  /** Idempotently add an optimizer rule to the session (the public
    * `experimental.extraOptimizations` hook; cluster deployments would
    * use `SparkSessionExtensions.injectOptimizerRule` instead). */
  def ensureOptimizerRule(spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(rule)) {
      cs.experimental.extraOptimizations =
        cs.experimental.extraOptimizations :+ rule
    }
  }

  /** Build a DataFrame with `rule` active, then RESTORE the session's
    * previous rule set — for rules that should rewrite one query, not
    * silently alter every later plan in a shared session. Forcing
    * `optimizedPlan` (a cached lazy val) pins the rewrite into the
    * returned frame, so it survives the restore; AQE's runtime
    * re-optimization uses its own rule set and never re-runs session
    * extras, so the rewrite is not lost at execution either. */
  def withScopedOptimizerRule(spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan])(
      build: => DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val before = cs.experimental.extraOptimizations
    ensureOptimizerRule(spark, rule)
    try { val df = build; df.queryExecution.optimizedPlan; df }
    finally cs.experimental.extraOptimizations = before
  }
}
