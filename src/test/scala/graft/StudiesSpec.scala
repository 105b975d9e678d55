package graft

import org.apache.spark.sql.DataFrame

/** Hand-computable fixtures for the round-11 measurement-method
  * operators (the DuckDB gate covers the corpus path; these pin the
  * estimator semantics on inputs where the right answer is knowable
  * by hand).
  */
class StudiesSpec extends SparkSpec {
  import spark.implicits._

  private def staged(name: String)(tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_studies_$name").toString
    tables.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def day(n: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
      .plusDays(n.toLong).atStartOfDay())

  test("q316 Kruskal-Wallis: two cleanly separated groups recover the " +
      "textbook H") {
    // values 1,2,3 vs 4,5,6: ranks 1-6, R_a=6, R_b=15,
    // H = 12/(6*7)*(36/3+225/3) - 3*7 = 3.857142... (1e-6 grid)
    val ev = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0))
      .zipWithIndex.map { case ((g, v), i) => (day(i), g, v) }
      .toDF("ts", "event_type", "value")
    val dir = staged("kw")("events" -> ev)
    val r = SparkEntry.queries("q316_kruskal_wallis")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(math.abs(r.getAs[Double]("h") - 3.857143) < 1e-4)
    // no ties: corrected H equals H
    assert(r.getAs[Double]("h_tie_corrected") === r.getAs[Double]("h"))
    assert(math.abs(r.getAs[Double]("epsilon_sq") -
      (r.getAs[Double]("h") - 1.0) / 4.0) < 1e-6)
  }

  test("q317 Friedman: a perfectly consistent day ranking gives " +
      "W = 1 and chi2 = n(k-1)") {
    // 3 days, type b always busier than type a: per-day ranks (1,2)
    // every day -> chi2 = 3, Kendall's W = 1
    val rows = (0 until 3).flatMap { dn =>
      Seq((day(dn), "a"), (day(dn), "b"), (day(dn), "b"))
    }
    val ev = rows.toDF("ts", "event_type")
    val dir = staged("friedman")("events" -> ev)
    val r = SparkEntry.queries("q317_friedman")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Double]("chi2") === 3.0)
    assert(r.getAs[Double]("kendall_w") === 1.0)
  }

  test("q318 Fleiss kappa: the 4-item two-rater textbook grid") {
    // items: (R,R), (R,A), (A,A), (N,N): S2=14, N=4, c=(3,3,2),
    // P-bar = 0.75, P_e = 22/64, kappa = 26/42 = 0.619048
    val li = Seq(
      (1L, 1, 10L, "R"), (1L, 2, 11L, "R"),
      (2L, 1, 12L, "R"), (2L, 2, 13L, "A"),
      (3L, 1, 14L, "A"), (3L, 2, 15L, "A"),
      (4L, 1, 16L, "N"), (4L, 2, 17L, "N"),
      // a 1-line order must be EXCLUDED, not rated
      (5L, 1, 18L, "R")
    ).toDF("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag")
    val dir = staged("fleiss")("lineitem" -> li)
    val r = SparkEntry.queries("q318_fleiss_kappa")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_items") === 4L)
    assert(r.getAs[Double]("p_bar") === 0.75)
    assert(math.abs(r.getAs[Double]("p_e") - 22.0 / 64.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("kappa") - 26.0 / 42.0) < 1e-6)
  }

  test("q319 Aalen-Johansen: two competing deaths split the incidence " +
      "mass exactly") {
    // endday=200; cust 1 dies t=10 (urgent cause 1), cust 2 dies t=20
    // (cause 2), cust 3 censored: CIF1 = 1/3, CIF2 = (2/3)*(1/2) = 1/3
    val orders = Seq(
      (1L, 1L, 100.0, day(0), "1-URGENT"),
      (2L, 1L, 100.0, day(10), "1-URGENT"),
      (3L, 2L, 100.0, day(0), "3-MEDIUM"),
      (4L, 2L, 100.0, day(20), "3-MEDIUM"),
      (5L, 3L, 100.0, day(0), "5-LOW"),
      (6L, 3L, 100.0, day(200), "5-LOW")
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val dir = staged("aj")("orders" -> orders)
    val out = SparkEntry.queries("q319_competing_risks")(spark, dir)
      .collect().map(r => r.getAs[Long]("cause") -> r).toMap
    assert(out(1L).getAs[Long]("events") === 1L)
    assert(out(2L).getAs[Long]("events") === 1L)
    assert(math.abs(out(1L).getAs[Double]("cif_final") - 1.0 / 3.0) < 1e-6)
    assert(math.abs(out(2L).getAs[Double]("cif_final") - 1.0 / 3.0) < 1e-6)
    // both deaths are inside the first year
    assert(out(1L).getAs[Double]("cif_365") ===
      out(1L).getAs[Double]("cif_final"))
    // an all-cause KM would give 1-S(20) = 2/3 = CIF1 + CIF2 exactly
    assert(math.abs(out(1L).getAs[Double]("cif_final") +
      out(2L).getAs[Double]("cif_final") - 2.0 / 3.0) < 1e-5)
  }

  test("q321 Naive Bayes: perfectly separable vocabularies classify " +
      "every test doc") {
    // every en doc says only 'zzq', every fr doc only 'qqz' — any
    // hash-split leaves the likelihoods separable, so whichever docs
    // land in the 20% test fold must all be classified correctly
    val docs = (1L to 40L).map { i =>
      if (i <= 20L) (i, "zzq zzq zzq", "en", "s", 11L)
      else (i, "qqz qqz qqz", "fr", "s", 11L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("nb")("documents" -> docs)
    val rows = SparkEntry.queries("q321_naive_bayes")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_correct") === r.getAs[Long]("n_test"))
      assert(r.getAs[Double]("accuracy") === 1.0)
    }
  }

  test("q322 distance correlation: an exact linear relation gives " +
      "dCor = 1") {
    // day n carries n+1 one-dollar orders: daily revenue = 100*count
    // exactly, so every distance is proportional and dCor = 1
    var key = 0L
    val orders = (0 until 5).flatMap { dn =>
      (0 to dn).map { _ => key += 1; (key, key, 1.0, day(dn)) }
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val dir = staged("dcor")("orders" -> orders)
    val r = SparkEntry.queries("q322_distance_corr")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 5L)
    assert(math.abs(r.getAs[Double]("dcor") - 1.0) < 1e-6)
    // dvar_y = 100 * dvar_x exactly (cents vs counts)
    assert(math.abs(r.getAs[Double]("dvar_y") -
      100.0 * r.getAs[Double]("dvar_x")) < 1e-3)
  }

  test("q323 jackknife: the two-day closed form is exact") {
    // $100 and $200 single-order days: ratio 150, pseudo-values
    // {200, 100}, SE = sqrt((1/2)(50^2+50^2)) = 50, bias-corrected 150
    val orders = Seq(
      (1L, 1L, 100.0, day(0)), (2L, 2L, 200.0, day(1))
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val dir = staged("jack")("orders" -> orders)
    val r = SparkEntry.queries("q323_jackknife_ratio")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 2L)
    assert(r.getAs[Double]("ratio") === 150.0)
    assert(math.abs(r.getAs[Double]("jack_se") - 50.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("bias_corrected") - 150.0) < 1e-5)
  }

  test("q324 UMass coherence: the 3-doc hand fixture sums the exact " +
      "log terms") {
    // df: alpha 3, beta 2, gamma 1 (ranks 1,2,3); pairs on rank order:
    // (beta|alpha) ln(3/3)=0, (gamma|alpha) ln(2/3), (gamma|beta) ln(1/2)
    val docs = Seq(
      (1L, "alpha beta", "en", "s1", 10L),
      (2L, "alpha beta", "en", "s1", 10L),
      (3L, "alpha gamma", "en", "s1", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("umass")("documents" -> docs)
    val r = SparkEntry.queries("q324_topic_coherence")(spark, dir)
      .collect()(0)
    assert(r.getAs[String]("source") === "s1")
    assert(r.getAs[Long]("n_pairs") === 3L)
    val want = math.log(2.0 / 3.0) + math.log(0.5)
    assert(math.abs(r.getAs[Double]("coherence") - want) < 1e-5)
  }

  test("q325 Dirichlet QL: smoothing ranks the broader match above " +
      "the single repeated term") {
    val docs = Seq(
      (1L, "spark spark", "en", "s", 11L),
      (2L, "spark vector", "en", "s", 12L),
      (3L, "other words", "en", "s", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("dirlm")("documents" -> docs)
    val rows = SparkEntry.queries("q325_dirichlet_lm")(spark, dir)
      .collect()
    assert(rows.length === 2) // doc 3 matches no query term
    // hand score: C=6 tokens, cf(spark)=3, cf(vector)=1, mu=2000
    def sc(tfS: Double, tfV: Double, dl: Double): Double =
      math.log((tfS + 2000.0 * 3.0 / 6.0) / (dl + 2000.0)) +
        math.log((tfV + 2000.0 * 1.0 / 6.0) / (dl + 2000.0))
    val want2 = sc(1.0, 1.0, 2.0)
    val want1 = sc(2.0, 0.0, 2.0)
    assert(want2 > want1) // the two-term match wins under smoothing
    assert(rows(0).getAs[Long]("doc_id") === 2L)
    assert(rows(0).getAs[Long]("n_matched") === 2L)
    assert(math.abs(rows(0).getAs[Double]("score") - want2) < 1e-5)
    assert(math.abs(rows(1).getAs[Double]("score") - want1) < 1e-5)
  }

  test("q326 Platt scaling: a steep empirical gradient fits a " +
      "positive slope bracketed by the class rates") {
    // x=0: 10% returns; x=10: 90% returns over 100 lines each
    val li = (1 to 100).flatMap { i =>
      Seq((i.toLong, 1, i.toLong, 0.00,
          if (i <= 10) "R" else "N"),
        (i.toLong + 100L, 1, i.toLong, 0.10,
          if (i <= 90) "R" else "N"))
    }.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_discount",
      "l_returnflag")
    val dir = staged("platt")("lineitem" -> li)
    val r = SparkEntry.queries("q326_platt_scaling")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n") === 200L)
    assert(r.getAs[Double]("emp_rate_low") === 0.1)
    assert(r.getAs[Double]("emp_rate_high") === 0.9)
    assert(r.getAs[Double]("a") > 0.0)
    val lo = r.getAs[Double]("pred_rate_low")
    val hi = r.getAs[Double]("pred_rate_high")
    assert(lo > 0.0 && lo < 0.5)
    assert(hi > 0.5 && hi < 1.0)
  }

  test("q327 entropy rate: a deterministic alternating chain is " +
      "perfectly predictable") {
    // a->b->a->b: every observed row has ONE successor, H_rate = 0
    val ev = Seq((1L, day(0), 1L, "a"), (2L, day(1), 1L, "b"),
      (3L, day(2), 1L, "a"), (4L, day(3), 1L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val dir = staged("entropy")("events" -> ev)
    val r = SparkEntry.queries("q327_entropy_rate")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_transitions") === 3L)
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Double]("entropy_rate") === 0.0)
    assert(r.getAs[Double]("predictability") === 1.0)
    assert(math.abs(r.getAs[Double]("max_entropy") - math.log(2.0))
      < 1e-6)
  }

  test("q328 Dunn post-hoc: the separated two-group fixture gives the " +
      "textbook z") {
    val ev = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0))
      .zipWithIndex.map { case ((g, v), i) => (day(i), g, v) }
      .toDF("ts", "event_type", "value")
    val dir = staged("dunn")("events" -> ev)
    val r = SparkEntry.queries("q328_dunn_posthoc")(spark, dir)
      .collect()(0)
    assert(r.getAs[String]("type_a") === "a")
    assert(r.getAs[Double]("mean_rank_a") === 2.0)
    assert(r.getAs[Double]("mean_rank_b") === 5.0)
    // z = (2-5)/sqrt((6*7/12)*(1/3+1/3)) = -1.963961...
    assert(math.abs(r.getAs[Double]("z") + 1.963961) < 1e-4)
  }

  test("q329 capture-recapture: the 3x4 overlap-2 grid recovers " +
      "Chapman's closed form") {
    val docs = Seq(
      (1L, "t1", "en", "s1", 2L), (2L, "t2", "en", "s1", 2L),
      (3L, "t3", "en", "s1", 2L),
      (4L, "t2", "en", "s2", 2L), (5L, "t3", "en", "s2", 2L),
      (6L, "t4", "en", "s2", 2L), (7L, "t5", "en", "s2", 2L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("capture")("documents" -> docs)
    val r = SparkEntry.queries("q329_capture_recapture")(spark, dir)
      .collect()(0)
    assert(r.getAs[String]("source_a") === "s2") // 4 docs > 3 docs
    assert(r.getAs[Long]("overlap") === 2L)
    // (4+1)(3+1)/(2+1) - 1 = 17/3
    assert(math.abs(r.getAs[Double]("chapman_total") -
      (5.0 * 4.0 / 3.0 - 1.0)) < 1e-3)
    assert(r.getAs[Double]("se") > 0.0)
  }

  test("q330 MCC/F1: a hand confusion matrix closes exactly") {
    // tp=2 fp=1 fn=1 tn=2: precision=recall=f1=2/3, mcc=3/9
    val emb = Seq(
      (1L, 0, Array(1.0f)), (2L, 2, Array(2.0f)),   // tp, tp
      (3L, 1, Array(3.0f)),                          // fp
      (4L, 0, Array(-1.0f)),                         // fn
      (5L, 1, Array(-2.0f)), (6L, 3, Array(-3.0f))   // tn, tn
    ).toDF("vec_id", "label", "embedding")
    val dir = staged("mcc")("embeddings" -> emb)
    val r = SparkEntry.queries("q330_mcc_f1")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("tp") === 2L && r.getAs[Long]("tn") === 2L)
    assert(r.getAs[Long]("fp") === 1L && r.getAs[Long]("fn") === 1L)
    assert(math.abs(r.getAs[Double]("f1") - 2.0 / 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("mcc") - 1.0 / 3.0) < 1e-6)
  }

  test("q331 Hill estimator: one 20x outlier over a flat tail gives " +
      "alpha = k/ln(20)") {
    // 1 doc of 400 words, 100 docs of 20, fillers of 1: top-101 =
    // outlier + the 20s, x_(k+1)=20, S = ln(400/20), alpha = 100/ln 20
    val docs = (Seq((0L, ("w " * 400).trim)) ++
      (1L to 100L).map(i => (i, ("w " * 20).trim)) ++
      (101L to 120L).map(i => (i, "w")))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("hill")("documents" -> docs)
    val r = SparkEntry.queries("q331_hill_tail")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("k_used") === 100L)
    assert(r.getAs[Long]("x_kplus1") === 20L)
    assert(math.abs(r.getAs[Double]("alpha") - 100.0 / math.log(20.0))
      < 1e-3)
    assert(!r.getAs[Boolean]("infinite_variance"))
  }

  test("q332 propensity overlap: strata partition the corpus and the " +
      "support flag matches the counts") {
    val rows = SparkEntry.queries("q332_propensity_overlap")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Long]("n_treated")
      val c = r.getAs[Long]("n_control")
      assert(t + c > 0L)
      val share = r.getAs[Double]("treated_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Boolean]("in_support") === (t > 0L && c > 0L))
    }
  }

  test("q333 n-gram novelty: an all-identical corpus has zero " +
      "novelty in every language") {
    val docs = (1L to 40L).map(i =>
      (i, "a b c d e", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("novel")("documents" -> docs)
    val rows = SparkEntry.queries("q333_ngram_novelty")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("novel_trigrams") === 0L)
      assert(r.getAs[Double]("novelty_rate") === 0.0)
      assert(r.getAs[Double]("mean_doc_novelty") === 0.0)
    }
  }

  test("q334 embedding JS: identical parity distributions give 0, " +
      "disjoint ones give 1 bit") {
    // each vector appears once under each parity -> identical
    // per-parity cell histograms by construction
    val same = (1L to 20L).map(i =>
        (i, (i % 2).toInt,
          Array.fill(64)((((i + 1) / 2 % 3)).toFloat - 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val dSame = staged("js0")("embeddings" -> same)
    val r0 = SparkEntry.queries("q334_embedding_js")(spark, dSame)
      .collect()(0)
    assert(r0.getAs[Double]("js_nats") === 0.0)
    val apart = (1L to 20L).map { i =>
      val v = if (i % 2 == 0) Array.fill(64)(1.0f)
      else Array.fill(64)(-1.0f)
      (i, (i % 2).toInt, v)
    }.toDF("vec_id", "label", "embedding")
    val dApart = staged("js1")("embeddings" -> apart)
    val r1 = SparkEntry.queries("q334_embedding_js")(spark, dApart)
      .collect()(0)
    assert(math.abs(r1.getAs[Double]("js_bits") - 1.0) < 1e-6)
  }

  test("q335 optimal threshold: a perfectly separable score finds " +
      "the exact cut") {
    // scores 1,2 negative; 3,4 positive: threshold >= 3 gives J=F1=1
    val emb = Seq(
      (1L, 1, Array(1.0f)), (2L, 3, Array(2.0f)),
      (3L, 0, Array(3.0f)), (4L, 2, Array(4.0f))
    ).toDF("vec_id", "label", "embedding")
    val dir = staged("thresh")("embeddings" -> emb)
    val r = SparkEntry.queries("q335_optimal_threshold")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_pos") === 2L && r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Double]("youden_threshold") === 3.0)
    assert(r.getAs[Double]("youden_j") === 1.0)
    assert(r.getAs[Double]("tpr_at_j") === 1.0)
    assert(r.getAs[Double]("fpr_at_j") === 0.0)
    assert(r.getAs[Double]("f1_threshold") === 3.0)
    assert(r.getAs[Double]("f1_best") === 1.0)
  }

  test("q336 sequential patterns: user support counts each user once " +
      "and an independent pair has lift 1") {
    val ev = Seq(
      (1L, day(0), 1L, "a"), (2L, day(1), 1L, "b"),
      (3L, day(0), 2L, "a"), (4L, day(1), 2L, "b"),
      (5L, day(0), 3L, "a"), (6L, day(1), 3L, "c")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val dir = staged("gsp")("events" -> ev)
    val rows = SparkEntry.queries("q336_sequential_patterns")(spark, dir)
      .collect()
    val top = rows(0)
    assert(top.getAs[String]("first_type") === "a")
    assert(top.getAs[String]("next_type") === "b")
    assert(top.getAs[Long]("support") === 2L)
    assert(math.abs(top.getAs[Double]("user_share") - 2.0 / 3.0) < 1e-6)
    // ua(a)=3, ub(b)=2, u=3: lift = 2*3/(3*2) = 1
    assert(top.getAs[Double]("lift") === 1.0)
  }

  test("q337 Poisson trend: a constant series fits zero slope and " +
      "rate ratio 1") {
    val orders = (0 until 10).flatMap { t =>
      (1 to 5).map(j => ((t * 10 + j).toLong, 1L, 100.0, day(t)))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val dir = staged("poisson")("orders" -> orders)
    val r = SparkEntry.queries("q337_poisson_trend")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Double]("mean_daily") === 5.0)
    assert(math.abs(r.getAs[Double]("b")) < 1e-3)
    assert(math.abs(r.getAs[Double]("rate_ratio") - 1.0) < 1e-3)
    assert(math.abs(r.getAs[Double]("a") - math.log(5.0)) < 1e-3)
  }

  test("q339 Wilcoxon signed-rank: a uniform +$100 week shift gives " +
      "the closed-form z") {
    // week 2 = week 1 + $100/day: 7 equal positive diffs, W+ = 28,
    // var = 7*8*15/24 - (7^3-7)/48 = 28, z = 14/sqrt(28)
    val orders = (0 until 14).map { t =>
      (t.toLong, 1L, if (t < 7) 100.0 else 200.0, day(t))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val dir = staged("wilcoxon")("orders" -> orders)
    val r = SparkEntry.queries("q339_wilcoxon_signed_rank")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_pairs") === 7L)
    assert(r.getAs[Double]("w_plus") === 28.0)
    assert(math.abs(r.getAs[Double]("z") - 14.0 / math.sqrt(28.0))
      < 1e-5)
  }

  test("q338 Brier decomposition: the Murphy identity holds and every " +
      "component is in range") {
    val r = SparkEntry.queries("q338_brier_decomposition")(
      spark, "/root/testdata/sf0.001").collect()(0)
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    val ob = r.getAs[Double]("base_rate")
    assert(rel >= 0.0 && res >= 0.0)
    assert(ob >= 0.0 && ob <= 1.0)
    assert(unc >= 0.0 && unc <= 0.25 + 1e-9)
    assert(math.abs(r.getAs[Double]("brier_binned") - (rel - res + unc))
      < 3e-9) // three independently-rounded 9-dp components
  }

  test("q340 DeLong: a perfect scorer vs an all-tied scorer reads " +
      "AUC 1.0 vs 0.5 with a decisive z") {
    // A = first component (separates perfectly), B = component sum
    // (constant 10 for every row -> all-tied AUC 0.5)
    val emb = (0 until 8).map { i =>
      val s = if (i % 2 == 0) (4 + i / 2).toFloat else (i / 2).toFloat
      (i.toLong, i % 2, Array(s, 10.0f - s))
    }.toDF("vec_id", "label", "embedding")
    val dir = staged("delong")("embeddings" -> emb)
    val r = SparkEntry.queries("q340_delong_auc")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_pos") === 4L && r.getAs[Long]("n_neg") === 4L)
    assert(r.getAs[Double]("auc_a") === 1.0)
    assert(r.getAs[Double]("auc_b") === 0.5)
    assert(r.getAs[Double]("auc_diff") === 0.5)
    // both component variances are exactly 0 -> z runs into the guard
    assert(r.getAs[Double]("z") > 1000.0)
  }

  test("q341 C-index: pair accounting closes and Somers' D is its " +
      "affine image") {
    val r = SparkEntry.queries("q341_c_index")(
      spark, "/root/testdata/sf0.001").collect()(0)
    val conc = r.getAs[Long]("concordant")
    val disc = r.getAs[Long]("discordant")
    val tied = r.getAs[Long]("risk_tied")
    assert(conc + disc + tied > 0L)
    val c = r.getAs[Double]("c_index")
    assert(c >= 0.0 && c <= 1.0)
    assert(math.abs(r.getAs[Double]("somers_d") - (2.0 * c - 1.0))
      < 1e-5)
    // hand identity on the margins: C = (conc + tied/2) / total
    val want = (conc + 0.5 * tied) / (conc + disc + tied).toDouble
    assert(math.abs(c - want) < 1e-5)
  }

  test("q342 Storey q-values: monotone in rank, bounded by the raw " +
      "step values, pi0 in range") {
    val rows = SparkEntry.queries("q342_storey_qvalues")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    var prev = -1.0
    rows.foreach { r => // already ordered by rank
      val q = r.getAs[Double]("q_value")
      val p = r.getAs[Double]("p_value")
      val pi0 = r.getAs[Double]("pi0")
      val m = rows.length
      val rank = r.getAs[Int]("rank")
      assert(pi0 > 0.0 && pi0 <= 1.0)
      assert(q >= prev - 1e-12, "q-values must be monotone in rank")
      assert(q <= pi0 * m * p / rank + 1e-9,
        "q is a running min of the raw step values")
      assert(r.getAs[Boolean]("significant") === (q <= 0.1))
      prev = q
    }
  }

  test("q343 linear MMD: identical parity samples give exactly zero") {
    // parity pairs carry the SAME vectors in the same index order, so
    // every quadruple's h telescopes to 0
    val vecs = (0 until 10).map(i =>
      Array.tabulate(64)(j => (i + 1).toFloat * (j % 3 - 1)))
    val emb = vecs.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong, 0, v), ((100 + i).toLong, 1, v))
    }.toDF("vec_id", "label", "embedding")
    val dir = staged("mmd")("embeddings" -> emb)
    val r = SparkEntry.queries("q343_mmd_linear")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_quads") === 5L)
    assert(r.getAs[Double]("mmd_linear") === 0.0)
    assert(r.getAs[Double]("se") === 0.0)
  }

  test("q344 GMM-EM: a clean bimodal length mix recovers both modes " +
      "and the 50/50 weight") {
    val docs = ((1L to 30L).map(i => (i, ("w " * 10).trim)) ++
      (31L to 60L).map(i => (i, ("w " * 1000).trim)))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("gmm")("documents" -> docs)
    val r = SparkEntry.queries("q344_gmm_em")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_docs") === 60L)
    assert(math.abs(r.getAs[Double]("mu_log_low") - math.log(10.0))
      < 0.05)
    assert(math.abs(r.getAs[Double]("mu_log_high") - math.log(1000.0))
      < 0.05)
    val w = r.getAs[Double]("weight_low")
    assert(w > 0.45 && w < 0.55)
    assert(r.getAs[Double]("separation") > 50.0)
  }

  test("q345 runs test: perfect alternation maximizes the run count") {
    // 10 days alternating $100/$200: 9 moves, every move a new run
    val orders = (0 until 10).map { t =>
      (t.toLong, 1L, if (t % 2 == 0) 100.0 else 200.0, day(t))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val dir = staged("runs")("orders" -> orders)
    val r = SparkEntry.queries("q345_runs_test")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_moves") === 9L)
    assert(r.getAs[Long]("n_runs") === 9L)
    // n1=5, n2=4: E=1+40/9, V=40*(40-9)/(81*8), z=(9-E)/sqrt(V)
    val e = 1.0 + 40.0 / 9.0
    val v = 40.0 * 31.0 / (81.0 * 8.0)
    assert(math.abs(r.getAs[Double]("z") - (9.0 - e) / math.sqrt(v))
      < 1e-3)
  }

  test("q346 Jarque-Bera: a symmetric 3-point series gives skew 0, " +
      "kurtosis 1.5") {
    val orders = Seq((1L, 1L, 10000.0, day(0)), (2L, 1L, 20000.0, day(1)),
      (3L, 1L, 30000.0, day(2)))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val dir = staged("jb")("orders" -> orders)
    val r = SparkEntry.queries("q346_jarque_bera")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Double]("skewness") === 0.0)
    assert(math.abs(r.getAs[Double]("kurtosis") - 1.5) < 1e-4)
    // JB = 3/6 * ((1.5-3)^2/4) = 0.28125 -> 0.2813 on the 4-dp grid
    assert(math.abs(r.getAs[Double]("jb_stat") - 0.28125) < 1e-3)
  }

  test("q347 Page trend: the alphabetically-increasing fixture gives " +
      "the closed-form positive z") {
    // type b (j=2) busier every day: L=15, E=13.5, Var=0.75
    val rows = (0 until 3).flatMap { dn =>
      Seq((day(dn), "a"), (day(dn), "b"), (day(dn), "b"))
    }
    val ev = rows.toDF("ts", "event_type")
    val dir = staged("page")("events" -> ev)
    val r = SparkEntry.queries("q347_page_trend")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Long]("l_stat") === 15L)
    assert(r.getAs[Double]("expected_l") === 13.5)
    assert(math.abs(r.getAs[Double]("z") - 1.5 / math.sqrt(0.75))
      < 1e-5)
  }

  test("q348 Breusch-Pagan: an exact linear series has zero residual " +
      "variance structure") {
    val orders = (0 until 10).map { t =>
      (t.toLong, 1L, 10000.0 * (t + 1), day(t))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val dir = staged("bp")("orders" -> orders)
    val r = SparkEntry.queries("q348_breusch_pagan")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 10L)
    assert(math.abs(r.getAs[Double]("beta") - 1.0) < 1e-6)
    assert(r.getAs[Double]("r2_aux") === 0.0)
    assert(r.getAs[Double]("bp_stat") === 0.0)
  }

  test("q349 source diversity: two equal sources behave like exactly " +
      "two effective sources") {
    val docs = (1L to 6L).map { i =>
      (i, "a b", if (i <= 3) "s1" else "s2", 3L)
    }.map { case (id, t, src, nc) => (id, t, "en", src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("diversity")("documents" -> docs)
    val r = SparkEntry.queries("q349_source_diversity")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_sources") === 2L)
    assert(math.abs(r.getAs[Double]("h_docs") - math.log(2.0)) < 1e-6)
    assert(r.getAs[Double]("effective_sources_docs") === 2.0)
    assert(r.getAs[Double]("effective_sources_tokens") === 2.0)
  }

  test("q350 STTR: a max-diversity block and a one-word block average " +
      "to the exact hand value") {
    // 25 distinct words then 'b' x 25: block TTRs 1.0 and 0.04
    val text = ((1 to 25).map(i => s"a$i") ++ Seq.fill(25)("b"))
      .mkString(" ")
    val docs = Seq((1L, text, "en", "s1", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("sttr")("documents" -> docs)
    val r = SparkEntry.queries("q350_sttr")(spark, dir).collect()(0)
    assert(r.getAs[String]("source") === "s1")
    assert(r.getAs[Long]("n_blocks") === 2L)
    assert(math.abs(r.getAs[Double]("sttr_25") - 0.52) < 1e-6)
  }

  test("q320 meta-analysis: heterogeneity keeps tau2/I2 in range and " +
      "the random-effects SE dominates the fixed one") {
    val r = SparkEntry.queries("q320_meta_analysis")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(r.getAs[Long]("k") >= 2L)
    assert(r.getAs[Double]("q_stat") >= 0.0)
    assert(r.getAs[Double]("tau2") >= 0.0)
    val i2 = r.getAs[Double]("i2")
    assert(i2 >= 0.0 && i2 <= 1.0)
    // sum of 1/(v+tau2) <= sum of 1/v, so se_random >= se_fixed
    assert(r.getAs[Double]("se_random") >= r.getAs[Double]("se_fixed")
      - 1e-9)
    assert(r.getAs[Double]("se_fixed") > 0.0)
  }
}
