package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quality, Rank, Sampling, Sketch}

/** Unit coverage for the round-5 analytics operators: BM25, character
  * entropy, weighted sampling, Count-Min sketch, MAD outliers.
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- BM25
  test("bm25 matches the hand-computed score on a 3-doc corpus") {
    val docs = Seq(
      (1L, "cat dog"),          // cat×1, 2 words
      (2L, "cat cat cat fish"), // cat×3, 4 words
      (3L, "bird fish")         // no match
    ).toDF("id", "text")
    val out = Rank.bm25(docs, "id", "text", Seq("cat"), k1 = 1.2, b = 0.75)
      .orderBy("id").collect()
    // N=3, df(cat)=2, idf = ln(1 + 1.5/2.5); avgdl = 8/3
    val idf = math.log(1.0 + 1.5 / 2.5)
    def bm(tf: Double, dl: Double): Double =
      graft.functions.Rounding.roundTo(
        idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8.0 / 3.0))), 4)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getDouble(2) == bm(1.0, 2.0))
    assert(out(1).getDouble(2) == bm(3.0, 4.0))
  }

  test("bm25 rejects empty and multi-word terms") {
    val docs = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Rank.bm25(docs, "id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Rank.bm25(docs, "id", "text", Seq("two words"))
    }
  }

  test("bm25: higher term frequency scores higher at equal length") {
    val docs = Seq(
      (1L, "cat dog dog dog"),
      (2L, "cat cat dog dog")
    ).toDF("id", "text")
    val m = Rank.bm25(docs, "id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(2L) > m(1L))
  }

  // --------------------------------------------------------- entropy
  test("charEntropy: known distributions") {
    val docs = Seq(
      (1L, "aaaa"),     // one symbol: 0 bits
      (2L, "aabb"),     // two equiprobable: 1 bit
      (3L, "abcd"),     // four equiprobable: 2 bits
      (4L, ""),         // excluded
      (5L, null.asInstanceOf[String]) // excluded
    ).toDF("id", "text")
    val m = Quality.charEntropy(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(m.keySet == Set(1L, 2L, 3L))
    assert(m(1L) == ((4L, 0.0)))
    assert(m(2L) == ((4L, 1.0)))
    assert(m(3L) == ((4L, 2.0)))
  }

  // -------------------------------------------------- weighted sample
  test("weightedSample is deterministic and excludes non-positive weights") {
    val rows = (1L to 200L).map(i => (i, (i % 7) * 100 + 1))
    val df = (rows :+ ((201L, 0L)) :+ ((202L, -5L))).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSeq
    val b = Sampling.weightedSample(df.repartition(7), "id", "w", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(a == b, "selection must not depend on partition layout")
    assert(!a.contains(201L) && !a.contains(202L))
    assert(a.length == 10)
  }

  test("weightedSample favors heavy rows (A-ES bias sanity)") {
    // two weight classes 1000:1 — across independent salts the heavy
    // rows should win the clear majority of the sample slots
    val df = ((1L to 50L).map(i => (i, 1000L)) ++
      (51L to 100L).map(i => (i, 1L))).toDF("id", "w")
    val heavyShare = (1 to 5).map { s =>
      val picked = Sampling.weightedSample(df, "id", "w", k = 10,
        salt = s"salt$s").select("id").as[Long].collect()
      picked.count(_ <= 50L)
    }.sum
    assert(heavyShare >= 45, s"heavy rows won only $heavyShare/50 slots")
  }

  // ------------------------------------------------------------- CMS
  test("count-min estimates never undercount and are exact off-grid-collisions") {
    val items = (Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++
      Seq.fill(1)("gamma") ++ Seq.fill(13)("delta")).toDF("k")
    val sketch = Sketch.countMin(items, "k", depth = 3, width = 1024)
    val probes = Seq("alpha", "beta", "gamma", "delta", "absent").toDF("k")
    val est = Sketch.estimate(sketch, probes, "k", depth = 3, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("alpha" -> 40L, "beta" -> 7L, "gamma" -> 1L,
      "delta" -> 13L, "absent" -> 0L)
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"$k undercounted: ${est(k)} < $t")
    }
    // 4 distinct keys in a 3×1024 grid: a 3-way simultaneous collision
    // is practically impossible, so estimates are exact here
    assert(est == truth)
  }

  test("count-min sketch is partition-layout independent (mergeable)") {
    val items = (1 to 500).map(i => s"k${i % 37}").toDF("k")
    def sk(df: org.apache.spark.sql.DataFrame) =
      Sketch.countMin(df, "k", depth = 2, width = 64)
        .select(col("sketch")).as[Seq[Long]].head()
    assert(sk(items.repartition(1)) == sk(items.repartition(13)))
  }

  // ------------------------------------------------------------- MAD
  test("madOutliers flags exactly the planted outliers") {
    // group g: 99 values in [100, 298] (step 2) + one wild point
    val base = (0 until 99).map(i => ("g", 100.0 + 2 * i))
    val df = (base :+ (("g", 5000.0)) :+ (("h", 7.0)) :+ (("h", 7.0)))
      .toDF("grp", "x")
    val out = Quality.madOutliers(df, "x", "grp").orderBy("grp").collect()
    val g = out(0)
    assert(g.getLong(1) == 100L)
    // med of 99 evens + 5000 = 199, mad = median|x-199| = 50
    assert(g.getDouble(2) == 199.0 && g.getDouble(3) == 50.0)
    assert(g.getLong(4) == 1L, "exactly the planted 5000 is an outlier")
    // all-identical group: mad = 0 flags nothing (no zero-divide trap)
    val h = out(1)
    assert(h.getDouble(3) == 0.0 && h.getLong(4) == 0L)
  }
}
