package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one compilation unit that lives inside Spark's package scope.
  *
  * Constructing a DataFrame from a custom [[LogicalPlan]] node (the
  * whole-operator extension path — SURVEY.md §2.9 preference rung (c))
  * requires `Dataset.ofRows`, which Spark scopes `private[sql]`; there
  * is no public constructor from a logical plan. This shim re-exports
  * exactly the two entry points the engine's custom plans need and
  * nothing else. Everything downstream (`graft.plans.*`) stays in the
  * engine's own namespace and uses only these two calls.
  */
object GraftSqlBridge {

  /** Wrap a (resolved) logical plan as a DataFrame on this session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame — the resolved
    * attribute references custom plan nodes are built from. */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
