package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Funnel, Fuzzy, History, Quality, Rank,
  Sampling, Series, Sketch}

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

  // -------------------------------------------------------- gap fill
  test("dailyGapFill: dense grid, zero fill, forward-carried last_active") {
    val ev = Seq(
      (1L, "2024-03-01 10:00:00"),
      (1L, "2024-03-01 11:00:00"),
      (1L, "2024-03-04 09:00:00"),
      (2L, "2024-03-02 08:00:00")
    ).toDF("uid", "s").select(col("uid"), col("s").cast("timestamp").as("ts"))
    val out = Series.dailyGapFill(ev, "uid", "ts")
      .orderBy("uid", "day")
      .select(col("uid"), col("day").cast("string"), col("n_events"),
        col("last_active").cast("string"), col("days_since"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), if (r.isNullAt(4)) -1 else r.getInt(4)))
    // span 03-01..03-04 → 4 days × 2 users
    assert(out.length == 8)
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._3).toSeq == Seq(2L, 0L, 0L, 1L), "zero-filled counts")
    assert(u1.map(_._4).toSeq == Seq("2024-03-01", "2024-03-01",
      "2024-03-01", "2024-03-04"), "carry-forward")
    assert(u1.map(_._5).toSeq == Seq(0, 1, 2, 0))
    val u2 = out.filter(_._1 == 2L)
    // user 2's first day precedes their first event: null last_active
    assert(u2.head._4 == null && u2.head._5 == -1)
    assert(u2.map(_._3).toSeq == Seq(0L, 1L, 0L, 0L))
  }

  // ------------------------------------------------------ fuzzy join
  test("editDistance1Pairs finds exactly the planted neighbors") {
    val rows = Seq(
      (1L, "kitten"), (2L, "kittex"),   // substitution
      (3L, "kitte"),                    // deletion of 1
      (4L, "kittenx"),                  // insertion on 1
      (5L, "mitten"),                   // substitution of 1
      (6L, "zebra"),                    // no neighbor
      (7L, "kitten")                    // duplicate string: distance 0
    ).toDF("id", "s")
    val got = Fuzzy.editDistance1Pairs(rows, "id", "s")
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = Set(
      (1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1), (1L, 5L, 1), (1L, 7L, 0),
      (2L, 7L, 1), (3L, 7L, 1), (4L, 7L, 1), (5L, 7L, 1),
      (2L, 3L, 1), // "kittex" vs "kitte": one deletion
      (2L, 4L, 1)) // "kittex" vs "kittenx": one insertion
    assert(got == expected, s"got $got")
  }

  test("editDistance1Pairs never misses a distance-1 pair (vs brute force)") {
    val words = Seq("cat", "cut", "cart", "ca", "dog", "dug", "dig",
      "digs", "cats", "bat", "at", "hat", "chat", "coat")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "s")
    val got = Fuzzy.editDistance1Pairs(df, "id", "s")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      i <- words.indices; j <- words.indices if i < j
      if lev(words(i), words(j)) <= 1
    } yield (i.toLong, j.toLong)).toSet
    assert(got == brute)
  }

  // ----------------------------------------------------------- funnel
  test("funnel stages require strict in-order progression") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // user 2: click BEFORE first view → stage stops at view
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 09:30:00"),
      // user 3: view + click, purchase precedes click → stage 2
      (3L, "view", "2024-01-01 08:00:00"),
      (3L, "purchase", "2024-01-01 08:30:00"),
      (3L, "click", "2024-01-01 09:00:00"),
      // user 4: never viewed → absent
      (4L, "purchase", "2024-01-01 07:00:00")
    ).map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("uid", "etype", "ts")
    val out = Funnel.stages(ev, "uid", "ts", "etype",
        Seq("view", "click", "purchase"))
      .orderBy("uid").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getInt(4) == 3)
    assert(out(1).getInt(4) == 1, "pre-view click must not count")
    assert(out(2).getInt(4) == 2, "pre-click purchase must not count")
    // user 1's stage times are the actual event times, micros
    assert(out(0).getLong(1) == ts("2024-01-01 10:00:00").getTime * 1000)
    assert(out(0).getLong(3) == ts("2024-01-01 10:10:00").getTime * 1000)
  }

  // ------------------------------------------------------------ SCD2
  test("changeHistory collapses runs and closes validity intervals") {
    val obs = Seq(
      (1L, "A", "2024-01-01", 10L),
      (1L, "A", "2024-01-03", 11L), // same value: collapsed
      (1L, "B", "2024-01-05", 12L),
      (1L, "A", "2024-01-07", 13L), // back to A: NEW interval
      (2L, null.asInstanceOf[String], "2024-01-02", 20L),
      (2L, null.asInstanceOf[String], "2024-01-04", 21L), // nulls collapse
      (2L, "C", "2024-01-06", 22L)
    ).toDF("k", "v", "d", "tie")
      .select(col("k"), col("v"), col("d").cast("date").as("d"), col("tie"))
    val out = History.changeHistory(obs, "k", "v", "d", Seq("tie"))
      .orderBy("k", "valid_from")
      .select(col("k"), col("v"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "A", "2024-01-01", "2024-01-05", false),
      (1L, "B", "2024-01-05", "2024-01-07", false),
      (1L, "A", "2024-01-07", null, true),
      (2L, null, "2024-01-02", "2024-01-06", false),
      (2L, "C", "2024-01-06", null, true)))
  }

  test("changeHistory breaks equal-timestamp ties deterministically") {
    val obs = Seq(
      (1L, "X", "2024-01-01", 2L),
      (1L, "Y", "2024-01-01", 1L) // same day: tie column orders Y first
    ).toDF("k", "v", "d", "tie")
      .select(col("k"), col("v"), col("d").cast("date").as("d"), col("tie"))
    val out = History.changeHistory(obs, "k", "v", "d", Seq("tie"))
      .orderBy("valid_from", "v").collect()
    assert(out.length == 2)
    val current = out.filter(_.getBoolean(4))
    assert(current.length == 1 && current.head.getString(1) == "X",
      "higher tie value observed later must be the current row")
  }

  // ------------------------------------------------------ transitions
  test("transitionMatrix: MLE conditionals per source state") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: a b a b ; user 2: a c  → from 'a': b,b,c; from 'b': a
    val ev = Seq(
      (1L, "a", "2024-01-01 10:00:00", 1L),
      (1L, "b", "2024-01-01 10:01:00", 2L),
      (1L, "a", "2024-01-01 10:02:00", 3L),
      (1L, "b", "2024-01-01 10:03:00", 4L),
      (2L, "a", "2024-01-01 11:00:00", 5L),
      (2L, "c", "2024-01-01 11:01:00", 6L)
    ).map { case (u, t, s, id) => (u, t, ts(s), id) }
      .toDF("uid", "etype", "ts", "eid")
    val out = Series.transitionMatrix(ev, "uid", "ts", "etype", "eid")
      .orderBy("etype", "next_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 0.6667), ("a", "c", 1L, 0.3333),
      ("b", "a", 1L, 1.0)))
  }

  // ------------------------------------------------------ skew report
  test("skewReport ranks heavy keys with share and skew factor") {
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      Seq.fill(5)("coolA") ++ Seq.fill(5)("coolB")).toDF("k")
    val out = Quality.skewReport(df, "k", topN = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    // 100 rows, 4 keys → mean 25
    assert(out.toSeq == Seq(
      ("hot", 60L, 0.6, 2.4), ("warm", 30L, 0.3, 1.2)))
  }

  // ------------------------------------------------------------- BPE
  test("bpe merges follow weighted pair frequency with greedy rewrite") {
    // words: aaab ×2, ab ×1
    // round 1 pairs: (a,a): 2·2=4, (a,b): 2+1=3 → merge (a,a)→aa
    // round 2 (aa,a):2, (a,b):2+1=3 → merge (a,b)→ab
    // round 3: aaab = [aa,ab]: (aa,ab):2 → merge → aaab
    // round 4: no pairs left → early stop
    val docs = Seq("aaab ab aaab").toDF("text")
    val out = Bpe.trainMerges(docs, "text", nMerges = 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("bpe greedy merge: runs collapse left-to-right ([aaaa] -> [aa][aa])") {
    val docs = Seq("aaaa").toDF("text")
    val out = Bpe.trainMerges(docs, "text", nMerges = 2)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    // round 1: (a,a) appears 3 times in 'aaaa' → merged 'aa'
    // round 2: [aa, aa] → (aa,aa) once
    assert(out.toSeq == Seq((1, "aa", 3L), (2, "aaaa", 1L)))
  }

  test("bpe tokenCounts applies merges as one map-only encode") {
    // words: 'abab' (chars a,b,a,b) with merges (a,b)->ab, (ab,ab)->abab
    val docs = Seq((1L, "abab ab x"), (2L, "abab abab")).toDF("id", "text")
    val out = graft.operators.Bpe.tokenCounts(docs, "id", "text",
        Seq(("a", "b"), ("ab", "ab")))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: abab→[abab](1), ab→[ab](1), x→[x](1) = 3 words 3 tokens
    // doc 2: abab→1, abab→1 = 2 words 2 tokens
    assert(out.toSeq == Seq((1L, 3L, 3L), (2L, 2L, 2L)))
  }

  // ---------------------------------------------------------- z-order
  test("zValue interleaves bits (Morton order on a 4x4 tile)") {
    import graft.operators.Lake
    val pts = for (x <- 0 to 3; y <- 0 to 3) yield (x, y)
    val out = pts.toDF("x", "y")
      .withColumn("z", Lake.zValue(col("x"), col("y"), 2))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // hand-checked Morton codes
    assert(out((0, 0)) == 0L && out((1, 0)) == 1L && out((0, 1)) == 2L &&
      out((1, 1)) == 3L && out((2, 0)) == 4L && out((2, 2)) == 12L &&
      out((3, 3)) == 15L)
    // quadrant locality: the low quadrant [0,1]² occupies codes 0..3
    val lowQuad = pts.filter(p => p._1 <= 1 && p._2 <= 1)
      .map(p => out(p)).toSet
    assert(lowQuad == Set(0L, 1L, 2L, 3L))
  }

  test("zOrderForWrite yields disjoint key ranges per output partition") {
    import graft.operators.Lake
    val df = (0 until 400).map(i => (i % 20, (i * 7) % 20)).toDF("x", "y")
    val parts = Lake.zOrderForWrite(df, "x", "y", bits = 5, numFiles = 4)
      .withColumn("z", Lake.zValue(col("x"), col("y"), 5))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(parts.length == 4)
    parts.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, "partition key ranges must not overlap")
    }
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

  test("q228 blocking quality: cross-block true pairs count as loss") {
    // (aaaa_x, aaaa_xy): d=1, same 4-char block -> found by SNM.
    // (bbbbz, cbbbz): d=1 via a FIRST-char substitution -> different
    // blocks, invisible to the blocking -> completeness 1/2.
    // pks avoid %5 == 0 so the corpus injection stays quiet.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_blocking").toString
    Seq((1L, "aaaa_x"), (2L, "aaaa_xy"), (3L, "bbbbz"), (4L, "cbbbz"))
      .toDF("p_partkey", "p_name")
      .write.parquet(s"$dir/part.parquet")
    val r = SparkEntry.queries("q228_blocking_quality")(spark, dir)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((4L, 2L, 1L, 1L)))
    assert(r.getDouble(4) == 0.5)           // completeness
    assert(r.getDouble(5) == 0.833333333)   // 1 - 1/6
  }
}
