package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Shared execution-hygiene helpers for the operator layer.
  *
  * Two concerns every heavy operator here has:
  *
  *  1. ''Parallelism without gratuitous shuffles'': small parquet
  *     inputs arrive as a single partition (one core), but a corpus
  *     that is already partitioned at least as wide as the cluster must
  *     NOT be re-shuffled — at 100 TB an unconditional
  *     `repartition(...)` before every call is a full-corpus shuffle
  *     for nothing. [[widen]] only widens.
  *
  *  2. ''Deterministic cache lifecycle'': operators persist subplans
  *     their own plan references multiple times (self-joins,
  *     verification joins). Those handles must not outlive the call —
  *     a library caller cannot be asked to `spark.catalog.clearCache()`
  *     (which would also drop caches the CALLER owns). [[owned]]
  *     materializes the (small) final result into its own cache and
  *     releases every intermediate handle before returning, so the one
  *     surviving handle is the returned DataFrame itself — explicitly
  *     the caller's to `.unpersist()` (or to let the session drop).
  */
private[graft] object Exec {

  /** Widen-only repartition: spread a narrow input across the cluster
    * before an expensive projection, but never funnel an already-wide
    * input down. The explicit partition count is preserved by AQE.
    */
  def widen(df: DataFrame, key: String): DataFrame = {
    // register the native expressions on the session that will ANALYZE
    // this operator's plan — inside foreachBatch the micro-batch runs
    // on a CLONED session whose function registry was copied at stream
    // start, so registering on SparkSession.active (the Column API's
    // fallback) is not enough
    graft.functions.expressions.GraftFunctions
      .ensureRegistered(df.sparkSession)
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, col(key))
    else df
  }

  /** Materialize `result` into its own MEMORY_AND_DISK cache (one
    * count job — the cache stores all columns), then release the
    * operator's intermediate caches. Eager by design: operators using
    * this return an already-computed result whose storage the CALLER
    * owns; no hidden operator-internal handle survives the call.
    *
    * `result` must be small relative to the input (candidate pairs,
    * signatures above threshold) — every operator here reduces before
    * it returns, so caching the result is bounded, while the
    * intermediates it releases are corpus-sized.
    */
  /** Hash-pin a table to `key` with the session's FIXED shuffle
    * partition count before caching it for an iterative loop. The
    * explicit count is the point: without it AQE coalesces the build
    * exchange to whatever count the data suggested, the cached layout
    * then fails every later join's clustering requirement (which asks
    * for the full shuffle-partition count), and the "pinned" table
    * re-shuffles per round anyway.
    */
  def pin(df: DataFrame, key: String): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
      col(key))

  /** Recursively delete a directory tree (no-op if absent), closing
    * the walk stream deterministically — `Files.walk` without a
    * `close()` leaks a directory handle per call. */
  def deleteRecursively(path: String): Unit = {
    val dir = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(dir)) {
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** Eagerly materialize a SMALL result (localCheckpoint truncates its
    * lineage so it no longer references any input file), then delete
    * the scratch directories it was computed from. For queries that
    * stage intermediate files/tables: without this the scratch outlives
    * the call — leaked per run, and colliding under concurrent
    * verifies when the path is fixed. */
  def detachFromScratch(result: DataFrame, scratchDirs: Seq[String]): DataFrame = {
    val out = result.localCheckpoint(true)
    scratchDirs.foreach { p =>
      try deleteRecursively(p) catch { case _: Throwable => () }
    }
    out
  }

  def owned(result: DataFrame, intermediates: Seq[DataFrame]): DataFrame = {
    val out = result.persist(StorageLevel.MEMORY_AND_DISK)
    try out.count()
    catch {
      case t: Throwable =>
        // a failed materialization must not strand the result handle
        // either — unpersist before surfacing the failure
        try out.unpersist(blocking = false) catch { case _: Throwable => () }
        throw t
    } finally intermediates.foreach(_.unpersist(blocking = false))
    out
  }
}
