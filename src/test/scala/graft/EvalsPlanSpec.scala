package graft

/** Physical-plan assertions for the round-8 evaluation operators —
  * their docstring scale claims, checked against what Catalyst
  * actually planned (sf0.001; plan SHAPE is SF-independent).
  */
class EvalsPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = planOnly {
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
  }

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

  test("q240 feature drift: boundaries attach as a broadcast, never " +
      "a cartesian") {
    val p = plan("q240_feature_drift")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"), s"bounds must broadcast:\n$p")
  }

  test("q248 NDCG: relevance joins broadcast the per-query frames") {
    val p = plan("q248_ndcg")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"qsrc/ideal must ride broadcast hash joins:\n$p")
  }

  test("q251 bootstrap: one shuffle family, no corpus-sized " +
      "single-partition window") {
    val p = plan("q251_bootstrap_ci")
    assert(!p.contains("CartesianProduct"), p)
    // replicate means aggregate by (type, b): HashAggregate present,
    // and no Window at all (the CI comes from array_sort, not a rank)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), s"no window expected:\n$p")
  }

  test("q247 Mann-Whitney: prefix sums stay bucket-partitioned") {
    val p = plan("q247_mann_whitney")
    assert(!p.contains("CartesianProduct"), p)
    // the in-bucket window partitions by (g, bk); the offset window
    // by g — neither is a global single-partition pass over values
    assert(p.contains("Window"), p)
  }
}
