package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Rounding.{roundTo => round}

/** Iterative graph analytics on edge tables — PageRank as the second
  * iterate-until-convergence workload next to [[KMeans]] (the
  * reference's whole premise, kernel.cu:190-215, is this loop shape:
  * re-scan a dataset per round, reduce, update a small state, repeat).
  *
  * Execution shape per iteration (what survives a 100 TB edge set):
  *  - the edge table is the big side; it is hash-partitioned ONCE on
  *    `src` and persisted — every iteration's rank⋈edge join reuses
  *    that layout, so each round costs one shuffle of the RANK table
  *    (N rows, ≪ edges) plus one aggregation keyed by `dst`;
  *  - out-degrees are folded into the persisted edge table up front
  *    (`weight = 1/outdeg(src)`), not recomputed per round;
  *  - ranks are QUANTIZED each round (shared rounding kernel, 9
  *    decimals) — same reproducibility contract as [[KMeans]]: the
  *    result is a pure function of the graph, independent of
  *    partitioning, join order, or engine.
  *
  * No GraphX, no RDDs: the loop is plain DataFrame joins, so Catalyst
  * handles pushdown/AQE per round and the plan stays inspectable.
  */
object Graph {

  /** `iters` rounds of damped PageRank over a directed edge table
    * (columns `src`, `dst`; parallel edges should be pre-deduped —
    * each surviving row carries one unit of adjacency). Nodes are the
    * union of both endpoint sets; nodes with no OUT-edges contribute
    * no redistributed mass (standard dangling-sink behavior: their
    * rank drains into the (1−d) teleport term only — callers wanting
    * strict mass conservation should symmetrize their edges first).
    * Returns `(node, rank)` with rank quantized to 9 decimals.
    */
  def pagerank(edges: DataFrame, damping: Double = 0.85,
               iters: Int = 2): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val e = Exec.widen(edges.select(col("src"), col("dst")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 1/outdeg folded into the edge table once — per-round cost is the
    // small rank table's shuffle, not a degree recompute
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val weighted = e.join(outdeg, "src")
      .select(col("src"), col("dst"),
        (lit(1.0) / col("deg")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val nRow = nodes.count().toDouble // materializes the node cache too
    val init = nodes.withColumn("rank", round(lit(1.0 / nRow), 9))
    val ranks = (1 to iters).foldLeft(init) { (r, _) =>
      val contrib = r.join(weighted, col("node") === col("src"))
        .groupBy("dst").agg(sum(col("rank") * col("w")).as("mass"))
      nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit((1 - damping) / nRow) +
            lit(damping) * coalesce(col("mass"), lit(0.0)), 9).as("rank"))
    }
    Exec.owned(ranks, Seq(e, nodes, weighted))
  }
}
