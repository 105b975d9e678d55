package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f),
                  Seq(0.0f, 0.0f, 1.0f), Seq(0.0f, 1.0f, 0.0f)))
      .toDF("a", "b", "c", "d")
    val r = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("self"),
      VectorFunctions.cosine(col("c"), col("d")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1)) < 1e-9)
  }

  test("knnBruteForce ranks the nearest vector first") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnBruteForce(
        corpus, corpus.filter(col("vec_id") === 1L), "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((2L, 1), (3L, 2)))
  }

  test("knnLsh candidates are a subset with reasonable recall on real data") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.knnBruteForce(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.knnLsh(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 6 hyperplanes over 64-dim random embeddings: bucket match keeps
    // ~1/64 of the corpus; genuinely-nearest vectors land together more
    // often than chance. Recall is data-dependent — assert sane bounds
    // and subset-ness rather than a tuned magic number.
    assert(approx.nonEmpty)
    assert(recall >= 0.05, s"recall=$recall")
  }

  test("widen() never re-shuffles an already-wide corpus (ANN shuffle hygiene)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val target = spark.sparkContext.defaultParallelism
    // already at cluster width: widen must return the SAME DataFrame —
    // the unconditional repartition it replaces was a full-corpus
    // shuffle before every ANN call
    val wide = emb.repartition(target, col("vec_id"))
    assert(graft.operators.Exec.widen(wide, "vec_id") eq wide)
    // narrow (single-partition) input: widen spreads it to full width
    val narrow = emb.coalesce(1)
    val widened = graft.operators.Exec.widen(narrow, "vec_id")
    assert(!(widened eq narrow))
    assert(widened.rdd.getNumPartitions == target)
  }

  test("rank window in knnBruteForce is deterministic under ties") {
    // two identical corpus vectors → tie on cosine → id ASC breaks it
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (5L, Seq(0.5f, 0.5f)), (4L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.knnBruteForce(
        corpus, corpus.filter(col("vec_id") === 1L), "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((4L, 1), (5L, 2)))
  }

  test("semDedup: exact twins are dropped inside their cell, others kept") {
    // two well-separated directions; ids 0,1 become the centroids
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),   // centroids
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.1f, 0.9f)),
      (10L, Seq(1.0f, 0.0f)),                          // exact twin of 0
      (11L, Seq(0.0f, 1.0f))                           // exact twin of 1
    ).toDF("id", "embedding")
    val got = Similarity.semDedup(vecs, "id", "embedding", k = 2, tau = 0.95)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // cell 0: {0, 2, 10} — 10 dropped (cos(0,10)=1); 2 kept (cos≈0.994 w/0?)
    // cos((1,0),(0.9,0.1)) = 0.9/(1·0.9055) ≈ 0.9939 → also ≥ .95: dropped
    assert(got(0L) == ((3L, 2L, 1L)))
    assert(got(1L) == ((3L, 2L, 1L)))
  }

  test("semDedup with tau above every pair similarity drops nothing") {
    val vecs = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.7f, 0.7f))).toDF("id", "embedding")
    val got = Similarity.semDedup(vecs, "id", "embedding", k = 2, tau = 0.999)
    assert(got.agg(sum("n_dropped")).head().getLong(0) == 0L)
    // every vector lands in exactly one cell
    assert(got.agg(sum("n_members")).head().getLong(0) == 3L)
  }
}
