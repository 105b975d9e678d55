package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bloom, Frequent, KMeans, Spans}

/** Round-4 scale operators: span dedup, Misra-Gries heavy hitters,
  * Lloyd k-means, Bloom decontamination. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  // ------------------------------------------------------------- Spans

  test("dropRepeatedSpans removes exactly the cross-document spans") {
    // spans are 2-word blocks; "dup dup" occurs in docs 1 and 2,
    // everything else is unique
    val df = docs(
      (1L, "dup dup a b c d"),
      (2L, "dup dup x y"),
      (3L, "p q r s t"))
    val out = Spans.dropRepeatedSpans(df, "doc_id", "text",
        block = 2, maxOcc = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out(0)._2 == 3 && out(0)._3 == 2) // doc 1: 3 blocks, kept 2
    assert(out(1)._2 == 2 && out(1)._3 == 1)
    assert(out(2)._2 == 3 && out(2)._3 == 3) // untouched
    // reassembly preserves order: doc 1 keeps "a b c d"
    val fp = md5(lit("a b c d"))
    assert(out(0)._4 ==
      df.sparkSession.range(1).select(fp).head().getString(0))
  }

  test("repeatedPassages finds a SHIFTED copy that stride blocks miss") {
    // doc 2 carries doc 1's 10-word passage shifted by one word —
    // stride-aligned blocks see different block texts, sliding
    // windows see 3 shared 8-word windows merging into one passage
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    val df = docs(
      (1L, s"$passage tail1 tail2"),
      (2L, s"lead $passage other words here"),
      (3L, "an entirely unrelated document body"))
    // the aligned detector misses it at block=8…
    val aligned = Spans.dropRepeatedSpans(df, "doc_id", "text",
      block = 8, maxOcc = 1).filter(col("n_kept") < col("n_blocks"))
    assert(aligned.count() == 0, "aligned blocks shouldn't fire here")
    // …the sliding detector reports the full 10-word passage in both
    val out = Spans.repeatedPassages(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L, 10L, 10L), (2L, 1L, 10L, 10L)))
  }

  test("repeatedPassages merges runs and separates distinct passages") {
    // doc 1 shares passage A with doc 2 and passage B with doc 3,
    // with a unique gap between them -> two separate passages
    val a = "a1 a2 a3 a4 a5 a6 a7 a8"
    val b = "b1 b2 b3 b4 b5 b6 b7 b8 b9"
    val df = docs(
      (1L, s"$a gap1 gap2 gap3 $b"),
      (2L, s"$a completely different ending here"),
      (3L, s"prefix words then $b"))
    val out = Spans.repeatedPassages(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 17L, 9L), (2L, 1L, 8L, 8L),
      (3L, 1L, 9L, 9L)))
    // a clean corpus reports nothing, and sub-k docs never window
    val clean = Spans.repeatedPassages(
      docs((1L, "short doc"), (2L, "short doc")), "doc_id", "text", k = 8)
    assert(clean.count() == 0)
  }

  test("dropRepeatedSpans drops within-document repetition too") {
    // occurrence count is corpus-wide, so a block repeated inside ONE
    // document crosses maxOcc as well
    val out = Spans.dropRepeatedSpans(
        docs((1L, "x y x y a b")), "doc_id", "text", block = 2, maxOcc = 1)
      .head()
    assert(out.getLong(1) == 3 && out.getLong(2) == 1)
  }

  test("dropRepeatedSpans: fully-boilerplate doc yields the empty fingerprint") {
    val out = Spans.dropRepeatedSpans(
        docs((1L, "same text"), (2L, "same text")),
        "doc_id", "text", block = 2, maxOcc = 1)
      .collect()
    val emptyFp = spark.range(1).select(md5(lit(""))).head().getString(0)
    assert(out.forall(r => r.getLong(2) == 0 && r.getString(3) == emptyFp))
  }

  test("dropRepeatedSpans is partition-layout independent") {
    val df = (1L to 100L)
      .map(i => (i, if (i % 4 == 0) "c o m m o n h e a d e r" +
        s" u n i q u e $i" else s"only doc $i words w$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    val a = Spans.dropRepeatedSpans(df, "doc_id", "text", block = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val b = Spans.dropRepeatedSpans(df.repartition(13), "doc_id", "text",
        block = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(a == b && a.nonEmpty)
  }

  // ---------------------------------------------------------- Frequent

  test("Misra-Gries is exact while capacity exceeds the vocabulary") {
    val toks = (1 to 500).map(i => s"w${i % 23}").toDS()
    val sk = toks.select(new Frequent.MisraGriesAgg(64).toColumn).head()
    val exact = (1 to 500).map(i => s"w${i % 23}")
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(sk.keys.length == 23)
    assert(sk.keys.zip(sk.counts).toMap == exact)
    // output order is (estimate desc, key asc) — deterministic
    val pairs = sk.keys.zip(sk.counts)
    assert(pairs.sortBy { case (k, c) => (-c, k) }.sameElements(pairs))
  }

  test("Misra-Gries undercounts by at most N/(capacity+1) under pressure") {
    // 2000 tokens, 200 distinct, capacity 50 — far past pressure
    val raw = (1 to 2000).map { i =>
      if (i % 3 == 0) s"heavy${i % 5}" else s"tail${i % 200}"
    }
    val n = raw.length
    val cap = 50
    val exact = raw.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // independent of partitioning (merges included)
    for (parts <- Seq(1, 7)) {
      val sk = raw.toDS().repartition(parts)
        .select(new Frequent.MisraGriesAgg(cap).toColumn).head()
      assert(sk.keys.length <= cap)
      sk.keys.zip(sk.counts).foreach { case (k, est) =>
        val truth = exact(k)
        assert(est <= truth, s"$k overcounted: $est > $truth")
        assert(truth - est <= n.toLong / (cap + 1),
          s"$k undercounted past the bound: $truth - $est")
      }
    }
  }

  // ------------------------------------------------------------ KMeans

  test("lloyd converges on well-separated clusters and is layout-stable") {
    // three tight blobs in 4-d; k = 3 must recover them exactly
    val pts = Seq.tabulate(30) { i =>
      val c = i % 3
      val base = Array.fill(4)(c * 10.0)
      (i.toLong, base.zipWithIndex.map { case (b, j) =>
        (b + 0.01 * ((i * 7 + j) % 5)).toFloat })
    }
    val df = pts.toDF("vec_id", "embedding")
    val out = KMeans.lloyd(df, "vec_id", "embedding", k = 3, iters = 2)
      .orderBy("cid").collect()
    assert(out.length == 3)
    assert(out.forall(_.getLong(1) == 10L))
    // inertia of a tight blob is tiny
    assert(out.forall(_.getDouble(2) < 1.0))
    val again = KMeans.lloyd(df.repartition(7), "vec_id", "embedding",
        k = 3, iters = 2)
      .orderBy("cid").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq ==
      again.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("lloyd iterations strictly improve inertia on mixed seeds") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def inertia(iters: Int): Double =
      KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = iters)
        .agg(sum("inertia")).head().getDouble(0)
    val i0 = inertia(0)
    val i2 = inertia(2)
    assert(i2 < i0, s"2 Lloyd rounds did not improve inertia: $i2 >= $i0")
  }

  test("lloyd assignment plan broadcasts centroids and never shuffles the corpus for assignment") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = planOnly {
      KMeans.lloyd(emb, "vec_id", "embedding", k = 2, iters = 1)
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") ||
      out.queryExecution.optimizedPlan.toString.contains("broadcast"))
  }

  // ------------------------------------------------------------- Bloom

  test("Bloom screening never false-negatives and matches exact decontam on hits") {
    val bench = docs((100L, "alpha beta gamma delta epsilon zeta"))
    val corpus = docs(
      (1L, "alpha beta gamma delta unrelated tail words here"),
      (2L, "totally distinct content with no shared trigrams at all"))
    val exact = graft.operators.Decontam.overlap(
        corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sk = Bloom.sketch(bench, "doc_id", "text", n = 3)
    val screened = Bloom.screen(corpus, sk, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every exact contamination count is ≤ the bloom-positive count
    exact.foreach { case (id, n) =>
      assert(screened.getOrElse(id, 0L) >= n,
        s"doc $id: bloom missed real contamination")
    }
    // doc 1 is genuinely contaminated: trigrams "alpha beta gamma" and
    // "beta gamma delta" appear on both sides
    assert(exact(1L) == 2L && screened(1L) >= 2L)
  }

  test("Bloom sketch is sparse and fixed-bound: word count ≤ mBits/64") {
    val bench = docs((1L, (1 to 200).map(i => s"b$i").mkString(" ")))
    val sk = Bloom.sketch(bench, "doc_id", "text", n = 3, mBits = 1 << 12)
      .head().getMap[Long, Long](0)
    assert(sk.size <= (1 << 12) / 64)
    assert(sk.size > 0)
  }
}
