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

  test("q274 mutual NN: round-trip pairs flag mutual, hub capture does not") {
    // a0<->b1 and a2<->b3 are reciprocal; a4's best is b1 but b1's
    // best is a0, so a4 is one-directional (mutual = false)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (4L, Array(1.0f, 1.0f)),
      (1L, Array(0.99f, 0.2f)), (3L, Array(0.1f, 0.99f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mnn_fixture").toString
    emb.write.parquet(s"$dir/embeddings.parquet")
    val rows = graft.SparkEntry.queries("q274_mutual_nn")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(rows.toSeq == Seq((0L, 1L, true), (2L, 3L, true),
      (4L, 1L, false)), rows.toSeq.toString)
  }

  test("lof: outlier scores >> 1, cluster member ~ 1; exact vs direct") {
    // ids 0-5 a tight cluster, id 6 far away; k=5. Expected values
    // recomputed DIRECTLY (plain loops over the same quantization
    // contract), independent of the engine's join/window plan.
    val vecs: Map[Long, Array[Double]] = Map(
      0L -> Array(0.0, 0.0), 1L -> Array(0.1, 0.0), 2L -> Array(0.0, 0.1),
      3L -> Array(0.1, 0.1), 4L -> Array(0.05, 0.05), 5L -> Array(0.2, 0.0),
      6L -> Array(10.0, 10.0))
    val emb = vecs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val k = 5
    def du(a: Array[Double], b: Array[Double]): Long = {
      // the parquet column is float32: promote through float first,
      // exactly as the engine's DotProduct sees the stored values
      def dp(x: Array[Double], y: Array[Double]): Double =
        x.indices.foldLeft(0.0)((s, i) =>
          s + x(i).toFloat.toDouble * y(i).toFloat.toDouble)
      math.floor((dp(a, a) + dp(b, b) - 2.0 * dp(a, b)) * 1e6 + 0.5).toLong
    }
    def knn(p: Long): Seq[(Long, Long)] = vecs.keys.toSeq.filter(_ != p)
      .map(o => (o, du(vecs(p), vecs(o)))).sortBy(t => (t._2, t._1)).take(k)
    def kdist(p: Long): Long = knn(p).map(_._2).max
    def ilrd(p: Long): Long =
      math.max(knn(p).map { case (o, d) => math.max(kdist(o), d) }.sum, 1L)
    def rinv(o: Long): Long = (2000000000000000000L + ilrd(o)) / (2L * ilrd(o))
    def lofD(q: Long): Double = math.floor(
      (BigDecimal(ilrd(q)) * BigDecimal(knn(q).map(t => rinv(t._1)).sum))
        .toDouble / (k * 1e18) * 1e6 + 0.5) / 1e6
    val got = Similarity.lof(emb, "vec_id", "embedding", k,
      col("vec_id") === 0L || col("vec_id") === 6L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(0L) == lofD(0L), s"got ${got(0L)} expected ${lofD(0L)}")
    assert(got(6L) == lofD(6L), s"got ${got(6L)} expected ${lofD(6L)}")
    assert(got(6L) > 3.0, s"outlier LOF should be >> 1: ${got(6L)}")
    assert(got(0L) < 1.5, s"cluster LOF should be ~ 1: ${got(0L)}")
  }

  test("ivf lake round-trip equals the in-memory knnIvf verbatim") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_rt").toString
    try {
      Similarity.ivfIndexBuild(emb, "vec_id", "embedding", "label", dir)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("query_id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
          .toSeq
      val mem = rows(Similarity.knnIvf(emb, qs, "vec_id", "embedding",
        "label", k = 5, nprobe = 2))
      val lake = rows(Similarity.ivfIndexQuery(qs, "vec_id", "embedding",
        dir, k = 5, nprobe = 2))
      assert(mem.nonEmpty)
      // persisting the index through the partitioned lake layout must
      // not change a single neighbor, cosine, or rank
      assert(lake == mem)
    } finally graft.operators.Exec.deleteRecursively(dir)
  }
}
