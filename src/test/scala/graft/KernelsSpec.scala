package graft

import org.apache.spark.sql.functions._

/** The shared-kernel memo ([[graft.Kernels]]) and the central oracle
  * signed-zero normalizer ([[graft.OracleSql]]). */
class KernelsSpec extends SparkSpec {

  // ---------------------------------------------------------- OracleSql

  test("normalizeSignedZero wraps a simple round call") {
    assert(OracleSql.normalizeSignedZero("SELECT round(x, 4) AS z FROM t")
      === "SELECT (round(x, 4) + 0.0) AS z FROM t")
  }

  test("normalizeSignedZero wraps nested rounds at every depth") {
    assert(OracleSql.normalizeSignedZero("round(round(a, 6) / b, 4)")
      === "(round((round(a, 6) + 0.0) / b, 4) + 0.0)")
  }

  test("normalizeSignedZero keeps :: casts binding to the rounded value") {
    assert(OracleSql.normalizeSignedZero("round(x, 2)::BIGINT")
      === "(round(x, 2) + 0.0)::BIGINT")
  }

  test("normalizeSignedZero skips string literals (regex parens, quotes)") {
    val sql = """regexp_replace(s, 'round((', 'x''(y', 'g')"""
    assert(OracleSql.normalizeSignedZero(sql) === sql)
  }

  test("normalizeSignedZero respects word boundaries") {
    assert(OracleSql.normalizeSignedZero("p_round(x) + xround(y)")
      === "p_round(x) + xround(y)")
  }

  test("normalizeSignedZero handles balanced complex oracle text") {
    val sql =
      """WITH a AS (SELECT round(sum(v) OVER (ORDER BY t), 4) AS r
        |FROM (SELECT regexp_extract(s, '([0-9]+)') AS v, t FROM x))
        |SELECT round(r / greatest(n, 1), 6) + 0.0 AS z FROM a""".stripMargin
    val out = OracleSql.normalizeSignedZero(sql)
    assert(out.contains("(round(sum(v) OVER (ORDER BY t), 4) + 0.0) AS r"))
    assert(out.contains("(round(r / greatest(n, 1), 6) + 0.0) + 0.0 AS z"))
  }

  test("every registry oracle normalizes without error and stays balanced") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // normalizeSignedZero already ran (SparkEntry applies it); a
      // second application must still parse (idempotent structure)
      val again = OracleSql.normalizeSignedZero(sql)
      assert(again.length >= sql.length, s"$name shrank")
    }
  }

  // ------------------------------------------------------------ Kernels

  private def fixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("kernels").toString
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", "en", "a"),
      (2L, "the quick brown fox jumps over the lazy dog today", "en", "a"),
      (3L, "completely different text with unrelated words here now", "en", "b"),
      (4L, "the quick brown fox jumps over the lazy dog tonight", "en", "a"))
      .toDF("doc_id", "text", "lang", "source")
    docs.write.parquet(s"$dir/documents.parquet")
    val li = Seq(
      (10L, 100L), (10L, 101L), (11L, 100L), (11L, 101L),
      (12L, 100L), (12L, 102L), (13L, 100L), (13L, 102L),
      (14L, 103L), (14L, 104L))
      .toDF("l_orderkey", "l_partkey")
    li.write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("minhashPairs memo: identical frame, computed once per (dir, params)") {
    Kernels.clear()
    val dir = fixtureDir()
    val a = Kernels.minhashPairs(spark, dir, threshold = 0.8)
    val b = Kernels.minhashPairs(spark, dir, threshold = 0.8)
    assert(a eq b, "second call must return the memoized frame")
    val direct = operators.Dedup.minhashPairs(
      Tables.documents(spark, dir), "doc_id", "text", threshold = 0.8)
    assert(a.orderBy("doc_a", "doc_b").collect().toSeq
      === direct.orderBy("doc_a", "doc_b").collect().toSeq)
    // different params → different kernel
    val c = Kernels.minhashPairs(spark, dir, threshold = 0.5)
    assert(!(a eq c))
    Kernels.clear()
    val d = Kernels.minhashPairs(spark, dir, threshold = 0.8)
    assert(!(a eq d), "clear() must drop the memo")
    Kernels.clear()
  }

  test("minhashComponents memo rides the cached pair kernel") {
    Kernels.clear()
    val dir = fixtureDir()
    val comp = Kernels.minhashComponents(spark, dir, threshold = 0.8)
    assert(comp eq Kernels.minhashComponents(spark, dir, threshold = 0.8))
    val rows = comp.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // docs 1,2 are exact twins (Jaccard 1.0) → one cluster labeled by
    // min id; doc 4 differs in its last word (Jaccard 7/9 < 0.8)
    assert(rows.toSeq === Seq((1L, 1L), (2L, 1L)))
    Kernels.clear()
  }

  test("bm25 top-ranked store == inline kernel reducts (q235/q248 law)") {
    Kernels.clear()
    val sf = "/root/testdata/sf0.001"
    val store = queries.Evals.bm25TopRanked(spark, sf)
    assert(store eq queries.Evals.bm25TopRanked(spark, sf))
    // ranks are assigned over the FULL candidate set inside the build,
    // so the store's reducts must match the inline kernel's row-for-row
    val (ranked, handles) = queries.Evals.bm25Ranked(spark, sf)
    assert(store.filter(col("rnk") <= 10).orderBy("qid", "rnk")
      .collect().toSeq
      === ranked.filter(col("rnk") <= 10).orderBy("qid", "rnk")
        .collect().toSeq)
    assert(store.filter(col("doc_id") === col("qid")).orderBy("qid")
      .collect().toSeq
      === ranked.filter(col("doc_id") === col("qid")).orderBy("qid")
        .collect().toSeq)
    handles.foreach { h =>
      h.unpersist(blocking = false)
      operators.Exec.releaseScratch(h)
    }
    Kernels.clear()
  }

  test("partCoEdges memo matches the inline wedge-join build") {
    Kernels.clear()
    val dir = fixtureDir()
    val edges = Kernels.partCoEdges(spark, dir)
    assert(edges eq Kernels.partCoEdges(spark, dir))
    val got = edges.orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // (100,101) co-occur in orders 10,11; (100,102) in 12,13; (103,104)
    // co-occur once only → cut by the support threshold
    assert(got === Seq((100L, 101L, 2L), (100L, 102L, 2L)))
    Kernels.clear()
  }
}
