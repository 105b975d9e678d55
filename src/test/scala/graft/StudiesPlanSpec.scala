package graft

/** Physical-plan assertions for the round-11 operators whose 100 TB
  * posture depends on a specific join/partitioning shape — a regression
  * that silently degrades one of these fails HERE, not in production.
  * (q322's days×days distance grid is the one DELIBERATE product in
  * this family: both sides are calendar-bounded, one side broadcast.)
  */
class StudiesPlanSpec extends SparkSpec {

  private def plan(name: String): String = planOnly {
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
  }

  test("q316 Kruskal-Wallis: the rank join stays keyed on the " +
      "quantized value, bucket offsets attach by broadcast") {
    val p = plan("q316_kruskal_wallis")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q321 Naive Bayes: the language table fans out by broadcast " +
      "and the train-count join stays keyed on (lang, word)") {
    val p = plan("q321_naive_bayes")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q324 topic coherence: postings semi-join the top set by " +
      "broadcast before any pair expansion; co-occ joins stay keyed") {
    val p = plan("q324_topic_coherence")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q325 Dirichlet QL: top-20 plans as TakeOrdered, not a global " +
      "sort") {
    val p = plan("q325_dirichlet_lm")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q319 competing risks never grows past keyed joins") {
    val p = plan("q319_competing_risks")
    assert(!p.contains("CartesianProduct"))
  }

  test("q331 Hill estimator: the top-101 is checkpoint-pinned (the " +
      "TakeOrdered runs once at materialization) and the closing " +
      "stage carries no cartesian") {
    // the final plan reads the 101-row localCheckpoint, so the
    // TakeOrderedAndProject is inside the materialized subplan, not
    // the printed one — assert the cheap invariants that CAN regress
    val p = plan("q331_hill_tail")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"))
  }

  test("q333 novelty joins the train trigram set by hash, never a " +
      "cartesian") {
    val p = plan("q333_ngram_novelty")
    assert(!p.contains("CartesianProduct"))
  }

  test("q335 threshold sweep attaches bucket offsets and totals by " +
      "broadcast") {
    val p = plan("q335_optimal_threshold")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q340 DeLong joins placements by key - never a pair " +
      "enumeration") {
    val p = plan("q340_delong_auc")
    assert(!p.contains("CartesianProduct"))
  }

  test("q343 linear MMD joins pair indices by key - never a Gram " +
      "matrix") {
    val p = plan("q343_mmd_linear")
    assert(!p.contains("CartesianProduct"))
  }
}
