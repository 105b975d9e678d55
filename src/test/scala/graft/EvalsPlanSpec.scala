package graft

/** Physical-plan assertions for the round-8 evaluation operators —
  * their docstring scale claims, checked against what Catalyst
  * actually planned (sf0.001; plan SHAPE is SF-independent).
  */
class EvalsPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("q224 PR sweep: thresholds ride a broadcast, never a cartesian") {
    val p = plan("q224_pr_curve")
    assert(!p.contains("CartesianProduct"),
      s"threshold frame must broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), s"no broadcast found:\n$p")
  }

  test("q221 Neyman: the k-row total attaches as a broadcast") {
    val p = plan("q221_neyman_allocation")
    assert(!p.contains("CartesianProduct"),
      s"normalizing total must broadcast:\n$p")
  }

  test("q216 JSD: the 1-row corpus total never plans a cartesian") {
    val p = plan("q216_source_divergence")
    assert(!p.contains("CartesianProduct"),
      s"corpus-total frame must broadcast:\n$p")
  }

  test("q214 AUC: no corpus-sized single-partition window") {
    // the only Window without partitioning must sit on the
    // `buckets`-row offset table (its input is an Aggregate over bk),
    // never on the distinct-score table
    val p = plan("q214_auc_roc")
    val idx = p.indexOf("Window")
    assert(idx >= 0)
    // bucketed local prefix runs partitioned by bk
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q227 point-in-time: key equi-join, interval as residual filter") {
    val p = plan("q227_point_in_time")
    // the interval predicate must NOT force a nested-loop/cartesian:
    // the customer key carries the join
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"interval join must stay key-hashed:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), s"no hash join found:\n$p")
  }
}
