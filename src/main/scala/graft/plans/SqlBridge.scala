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

  /** The materialized RDDs inside a Dataset's plan — every
    * [[execution.LogicalRDD]] leaf, i.e. the storage behind
    * `localCheckpoint`. `Dataset.unpersist` does NOT release these:
    * it only routes through the CacheManager, while a checkpoint's
    * blocks are held by the RDD itself and are otherwise reclaimed
    * only when a driver GC lets the ContextCleaner reap the
    * unreachable RDD object. Deterministic release
    * ([[graft.operators.Exec.releaseScratch]]) needs the RDD handles.
    */
  def checkpointRdds(df: Dataset[_]): Seq[org.apache.spark.rdd.RDD[_]] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.logical.collect {
      case r: execution.LogicalRDD => r.rdd
    }

  /** The materialized RDD of a frame that IS a checkpoint handle —
    * i.e. its plan root is the LogicalRDD itself (what
    * `localCheckpoint` returns), not a plan merely composed over one.
    * The distinction matters for release: a composed plan's embedded
    * LogicalRDDs may belong to a caller's still-live input. */
  def rootCheckpointRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.logical match {
      case r: execution.LogicalRDD => Some(r.rdd)
      case _ => None
    }
}
