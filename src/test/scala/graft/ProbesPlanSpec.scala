package graft

/** Physical-plan assertions for the round-12 probe operators whose
  * 100 TB posture depends on a specific join/partitioning shape — a
  * regression that silently degrades one of these fails HERE, not in
  * production. (The day-grid probes q354–q357/q364 DO carry
  * single-partition windows and one-row cross joins by design: the day
  * grid is calendar-bounded at any SF.)
  */
class ProbesPlanSpec extends SparkSpec {

  private def plan(name: String): String = planOnly {
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
  }

  test("q352 Mood: rank windows stay PARTITIONed by group and the " +
      "group-totals frame attaches by broadcast") {
    val p = plan("q352_mood_scale")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    // every Window in this plan must carry a partition spec — a bare
    // global-ordered window over the value table would single-thread
    // the rank pass at scale
    val windows = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("partitionBy") ||
      w.contains("[g"), s"unpartitioned window in q352: $w"))
  }

  test("q353 CvM: cumulative windows stay PARTITIONed by group") {
    val p = plan("q353_cvm_two_sample")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q362 fuzzy decontam: the band join is a broadcast of the " +
      "benchmark chunks, never a corpus-corpus sort-merge") {
    val p = plan("q362_fuzzy_decontam")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q363 canonical dedup: representative choice is a fingerprint-" +
      "PARTITIONed window, no global sort") {
    val p = plan("q363_canonical_dedup")
    assert(!p.contains("CartesianProduct"))
    val windows = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("fp"),
      s"window not fingerprint-partitioned in q363: $w"))
  }

  test("q365 Stuart-Maxwell: first/last selection is customer-" +
      "PARTITIONed; the 3x3 collapse carries no cartesian") {
    val p = plan("q365_stuart_maxwell")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("o_custkey"))
  }

  test("q372 Jonckheere: both grid windows are PARTITIONed (by group " +
      "over values, by value over groups) — no global sort") {
    val p = plan("q372_jonckheere")
    assert(!p.contains("CartesianProduct"))
    val windows = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.size >= 2)
    windows.foreach(w =>
      assert(w.contains("[g") || w.contains("[u"),
        s"unpartitioned window in q372: $w"))
  }

  test("q366 Yuen: the order-statistic windows stay arm-PARTITIONed") {
    val p = plan("q366_yuen_trimmed")
    assert(!p.contains("CartesianProduct"))
    val windows = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("[y"),
      s"window not arm-partitioned in q366: $w"))
  }

  test("q376 cross-lingual dup: lang lookups attach by keyed joins, " +
      "no cartesian") {
    val p = plan("q376_cross_lingual_dup")
    assert(!p.contains("CartesianProduct"))
  }

  test("q358/q360 reliability scans are single-pass aggregations " +
      "with no join at all") {
    for (q <- Seq("q358_cronbach_alpha")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q grew an unexpected join")
    }
    // q360 joins docItems back to documents on doc_id — keyed, not
    // cartesian
    val p360 = plan("q360_cochran_q")
    assert(!p360.contains("CartesianProduct"))
  }

  test("q380 ivf lake query: the cells scan carries a real partition " +
      "filter (only probed cells read) and candidates attach by broadcast") {
    // the q380 registry entry checkpoints its result (scratch-dir
    // hygiene), which hides the plan — pin the operator's plan directly
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q380_plan").toString
    try {
      graft.operators.Similarity
        .ivfIndexBuild(emb, "vec_id", "embedding", "label", dir)
      val p = graft.operators.Similarity
        .ivfIndexQuery(emb.filter(org.apache.spark.sql.functions.col(
          "vec_id") < 20), "vec_id", "embedding", dir, k = 5, nprobe = 2)
        .queryExecution.executedPlan.toString
      // a bare isnotnull(cell) prunes nothing — the probed-cell IN-set
      // must reach the scan's PartitionFilters
      val pf = p.linesIterator.filter(_.contains("PartitionFilters")).toSeq
      assert(pf.nonEmpty, s"no PartitionFilters in q380 cells scan:\n$p")
      assert(pf.exists(l => l.contains("IN") || l.contains("INSET")),
        s"probed-cell set did not reach PartitionFilters: $pf")
      assert(p.contains("BroadcastHashJoin"))
      assert(!p.contains("CartesianProduct"))
    } finally graft.operators.Exec.deleteRecursively(dir)
  }
}
