package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq

/** Product quantization ([[graft.operators.Pq]]): codebook recovery on
  * separable subspace blobs, layout independence, and the
  * malformed-vector contract.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 40 vectors of dim 8, m=2 subspaces of 4 dims; each subspace has two
  // clear blobs (around 0 and around 10), assigned independently so the
  // subspaces carry DIFFERENT partitions of the ids — exactly what PQ
  // exploits and a single global k-means cannot express
  private def blobs = {
    val rows = (0 until 40).map { i =>
      val a = if (i % 2 == 0) 0.0 else 10.0       // subspace 0 blob
      val b = if (i % 3 == 0) 0.0 else 10.0       // subspace 1 blob
      val jit = (i % 5) * 0.01
      (i.toLong, Array.fill(4)(a + jit).map(_.toFloat) ++
        Array.fill(4)(b + jit).map(_.toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("separable blobs quantize tightly in every subspace") {
    val stats = Pq.codebookStats(blobs, "vec_id", "embedding",
      dim = 8, m = 2, k = 2, iters = 2).collect()
    // every subspace accounts for all 40 vectors
    assert(stats.groupBy(_.getAs[Int]("sub"))
      .forall(_._2.map(_.getAs[Long]("n_vectors")).sum == 40))
    // blob structure: sub 0 splits 20/20 (i%2), sub 1 splits ~13/27 (i%3)
    val sub0 = stats.filter(_.getAs[Int]("sub") == 0)
      .map(_.getAs[Long]("n_vectors")).sorted
    val sub1 = stats.filter(_.getAs[Int]("sub") == 1)
      .map(_.getAs[Long]("n_vectors")).sorted
    assert(sub0.toSeq == Seq(20L, 20L))
    assert(sub1.toSeq == Seq(14L, 26L))
    // within-blob spread is the 0.04-range jitter → tiny inertia
    assert(stats.forall(_.getAs[Double]("inertia") < 1.0))
  }

  test("codes are a pure function of the corpus: repartition-stable") {
    val base = Pq.codebookStats(blobs, "vec_id", "embedding",
      dim = 8, m = 2, k = 2, iters = 1)
      .orderBy("sub", "cid").collect().toSeq
    val shuffled = Pq.codebookStats(blobs.repartition(7), "vec_id",
      "embedding", dim = 8, m = 2, k = 2, iters = 1)
      .orderBy("sub", "cid").collect().toSeq
    assert(base == shuffled)
  }

  test("vectors with the wrong dimension drop instead of mis-encoding") {
    val withBad = blobs.union(
      Seq((999L, Array.fill(3)(1.0f))).toDF("vec_id", "embedding"))
    val stats = Pq.codebookStats(withBad, "vec_id", "embedding",
      dim = 8, m = 2, k = 2, iters = 1).collect()
    assert(stats.filter(_.getAs[Int]("sub") == 0)
      .map(_.getAs[Long]("n_vectors")).sum == 40)
  }

  test("ADC top-k finds same-blob neighbors and excludes the query") {
    val res = Pq.adcTopK(blobs, blobs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", dim = 8, m = 2, k = 2, iters = 2, topK = 5)
      .collect()
    assert(res.length == 5)
    assert(res.forall(_.getAs[Long]("query_id") == 0L))
    assert(res.forall(_.getAs[Long]("neighbor_id") != 0L))
    // vec 0 sits in blob (even, %3==0); its ADC neighbors must share
    // BOTH blob memberships (codes identical → adc distance ≈ inertia)
    res.foreach { r =>
      val n = r.getAs[Long]("neighbor_id")
      assert(n % 2 == 0 && n % 3 == 0, s"neighbor $n not in vec 0's blobs")
    }
    // ranks are 1..5 and distances non-decreasing
    assert(res.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
    val byRank = res.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("adc_d2"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
  }

  test("dim must split into m equal subvectors") {
    assert(intercept[IllegalArgumentException] {
      Pq.codebookStats(blobs, "vec_id", "embedding", dim = 8, m = 3,
        k = 2, iters = 1)
    }.getMessage.contains("subvectors"))
  }
}
