package graft

/** Physical-plan assertions for the round-10 operators whose 100 TB
  * posture depends on a specific join/partitioning shape — a regression
  * that silently degrades one of these fails HERE, not in production.
  * (The only nested-loop joins these plans may contain are 1-row
  * broadcast scalar attaches — a CartesianProduct anywhere means a
  * candidate generator lost its key.)
  */
class MethodsPlanSpec extends SparkSpec {

  private def plan(name: String): String = planOnly {
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
  }

  test("q311 caliper matching generates candidates by bucket " +
      "equi-join - never a cartesian") {
    val p = plan("q311_caliper_matching")
    assert(!p.contains("CartesianProduct"))
  }

  test("q308 CKA attaches marginals by broadcast, never a shuffle " +
      "join on the pair table") {
    val p = plan("q308_cka_quantization")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q301 Pareto frontier attaches the class table by broadcast") {
    val p = plan("q301_pareto_frontier")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q303 Bradley-Terry's win-count join stays keyed on " +
      "(lang, class) - never a cartesian") {
    val p = plan("q303_bradley_terry")
    assert(!p.contains("CartesianProduct"))
  }
}
