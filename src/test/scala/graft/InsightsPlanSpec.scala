package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunks, Quality, Similarity}

/** Physical-plan assertions for the round-5 insight operators — the
  * scale claims in their docstrings, checked against what Catalyst
  * actually planned (sf0.001 keeps these instant; plan SHAPE is
  * SF-independent).
  */
class InsightsPlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("sliding chunks plan is map-only: no Exchange anywhere") {
    val out = Chunks.slidingChunks(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", size = 32, stride = 24)
    val p = plan(out)
    assert(!p.contains("Exchange"),
      s"chunking must not shuffle — fan-out belongs in the scan:\n$p")
    assert(out.count() > 0)
  }

  test("hard negatives broadcast the query batch, never the corpus") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.hardNegatives(emb,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", "label", k = 5)
    val p = plan(out)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"query batch must ride a broadcast:\n$p")
    // the corpus side must reach the join without a shuffle exchange
    // (widen() is a no-op on this already-wide input; ranking adds the
    // one hash exchange AFTER candidates shrink to query_id rows)
    val joinSection = p.substring(p.indexOf("BroadcastNestedLoopJoin")
      .max(p.indexOf("BroadcastHashJoin")))
    assert(!joinSection.replaceAll("(?s)BroadcastExchange.*", "")
        .contains("ShuffleExchange") ||
      !joinSection.contains("ShuffleExchange"),
      s"corpus shuffled before the broadcast join:\n$joinSection")
    assert(out.count() > 0)
  }

  test("equi-depth bins attach boundaries via broadcast, no row join") {
    val out = Quality.equiDepthHistogram(
      Tables.orders(spark, "/root/testdata/sf0.001")
        .select(col("o_totalprice")), "o_totalprice", k = 4)
    val p = plan(out)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row boundary table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"boundary attach must never plan a CartesianProduct:\n$p")
    assert(out.count() == 4)
  }

  test("vocab coverage broadcasts the K-row vocabulary onto the tokens") {
    val out = graft.operators.Quality.vocabCoverage(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", topK = 50)
    val p = plan(out)
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"vocab must ride a broadcast, not shuffle the token stream:\n$p")
    assert(out.count() > 0)
  }

  test("negative sampling plans per-bucket windows, never a global sort") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    val out = graft.operators.Graph.negativeSample(edges, "a", "b",
      buckets = 4)
    val p = plan(out)
    // a window without PARTITION BY plans as Exchange SinglePartition —
    // the scale-killer this operator's bucketing exists to avoid
    assert(!p.contains("SinglePartition"),
      s"bucketed window must not collapse to one partition:\n$p")
    out.count() // executes fine
    spark.catalog.clearCache()
  }

  test("psi drift never joins the two periods row-to-row") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val split = lit("2000-01-01").cast("date")
    val out = Quality.psiDrift(
      orders.filter(col("o_orderdate") < split),
      orders.filter(col("o_orderdate") >= split),
      "o_totalprice", k = 4)
    val p = plan(out)
    // the only SortMergeJoin/ShuffledHashJoin allowed is on the k-row
    // bin tables; corpus-cardinality joins would show as joins below
    // an aggregation that hasn't happened yet — assert the join count
    // stays at the expected bin-table merges
    val joins = "SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(p).length
    assert(joins <= 1, s"unexpected row-level join in PSI plan:\n$p")
    assert(out.count() == 4)
  }

  test("semDedup broadcasts the k centroids; assignment is one agg") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("embedding"))
    val out = Similarity.semDedup(emb, "id", "embedding", k = 4, tau = 0.99)
    val p = plan(out)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the k-row centroid table must ride a broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"centroid attach must never plan a CartesianProduct:\n$p")
    assert(out.count() == 4)
  }

  test("mixtureWeights touches the corpus in exactly one aggregation") {
    val out = graft.operators.Sampling.mixtureWeights(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      "source", "text", alpha = 0.5, budget = 1000000L)
    val p = plan(out)
    // corpus-side HashAggregate pairs (partial+final) for the per-source
    // rollup, plus the k-row wq sum — no join back to row data
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row total must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no row-level join belongs in this plan:\n$p")
    assert(out.count() > 0)
  }

  test("sourceOverlap totals attach as k-row broadcasts") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("source"))
    val dirty = docs.unionByName(docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"), lit("mirror").as("source")))
    val out = planOnly {
      graft.operators.Dedup.sourceOverlap(dirty, "text", "source")
    }
    val p = plan(out)
    assert(p.contains("BroadcastHashJoin"),
      s"per-source totals must broadcast onto the pair table:\n$p")
    assert(out.count() > 0)
  }
}
