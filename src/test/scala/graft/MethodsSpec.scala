package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Hand-computable fixtures for the round-10 measurement-method
  * operators (the DuckDB gate covers the corpus path; these pin the
  * estimator semantics on inputs where the right answer is knowable
  * by hand).
  */
class MethodsSpec extends SparkSpec {
  import spark.implicits._

  private def staged(name: String)(tables: (String, DataFrame)*): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_methods_$name").toString
    tables.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def day(n: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
      .plusDays(n.toLong).atStartOfDay())

  test("q281 McNemar: disagreement cells and zero-diff continuity " +
      "correction are exact") {
    // r1: y=T, A right / B wrong (b cell); r2: y=F, both wrong;
    // r3: y=T, A wrong / B right (c cell); r4: y=F, both right.
    val emb = Seq(
      (1L, 0, Array(1.0f, -5.0f)),
      (2L, 1, Array(1.0f, 1.0f)),
      (3L, 2, Array(-1.0f, 3.0f)),
      (4L, 3, Array(-1.0f, -1.0f))
    ).toDF("vec_id", "label", "embedding")
    val dir = staged("mcnemar")("embeddings" -> emb)
    val r = SparkEntry.queries("q281_mcnemar")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("acc_a") === 0.5)
    assert(r.getAs[Double]("acc_b") === 0.5)
    assert(r.getAs[Long]("b_only") === 1L)
    assert(r.getAs[Long]("c_only") === 1L)
    // |b-c| = 0 -> corrected numerator max(0, -1)^2 = 0
    assert(r.getAs[Double]("mcnemar_chi2") === 0.0)
  }

  test("q283 segmented trend: a clean two-regime series recovers the " +
      "exact breakpoint and both slopes") {
    // days 0..9 flat at $1M/day; days 10..19 a steep exact line
    // ($2M + $500k*(t-10)): SSE is zero only when the break sits at
    // day 9, so the quantized argmin must land there.
    val orders = (0 to 9).map(t => (t.toLong, 1L, "O",
        1000000.0, day(t), "1-URGENT")) ++
      (10 to 19).map(t => (t.toLong, 1L, "O",
        2000000.0 + 500000.0 * (t - 10), day(t), "1-URGENT"))
    val dir = staged("segtrend")("orders" ->
      orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"))
    val r = SparkEntry.queries("q283_segmented_trend")(spark, dir)
      .collect()(0)
    assert(r.getAs[java.sql.Date]("break_dt").toString === "2024-01-10")
    assert(r.getAs[Long]("n_days") === 20L)
    assert(r.getAs[Long]("n_left") === 10L)
    // revenue is in $10k units: left slope 0, right slope 50/day
    assert(math.abs(r.getAs[Double]("slope_left")) < 1e-6)
    assert(math.abs(r.getAs[Double]("slope_right") - 50.0) < 1e-6)
    assert(r.getAs[Double]("sse_two") === 0.0)
    assert(r.getAs[Double]("improvement") === 1.0)
  }

  test("q284 Kendall tau-b: hand-counted pair classes with an x tie") {
    // daily (x=orders, y=revenue): (1,10), (2,20), (3,15), (3,25)
    // pairs: C=4, D=1, ties_x=1, ties_y=0 -> tau_b = 3/sqrt(30)
    def o(id: Long, d: Int, price: Double) =
      (id, 1L, "O", price, day(d), "1-URGENT")
    val orders = Seq(
      o(1, 0, 10.0),
      o(2, 1, 12.0), o(3, 1, 8.0),
      o(4, 2, 5.0), o(5, 2, 5.0), o(6, 2, 5.0),
      o(7, 3, 10.0), o(8, 3, 10.0), o(9, 3, 5.0))
    val dir = staged("kendall")("orders" ->
      orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"))
    val r = SparkEntry.queries("q284_kendall_tau")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Long]("concordant") === 4L)
    assert(r.getAs[Long]("discordant") === 1L)
    assert(r.getAs[Long]("ties_x") === 1L)
    assert(r.getAs[Long]("ties_y") === 0L)
    assert(r.getAs[Long]("ties_both") === 0L)
    assert(math.abs(r.getAs[Double]("tau_b") - 3.0 / math.sqrt(30.0))
      < 1e-6)
  }

  test("q287 silhouette: a singleton cluster scores exactly 1 under " +
      "the centroid variant") {
    val emb = Seq(
      (1L, 0, Array(0.0f, 0.0f)),
      (2L, 1, Array(3.0f, 0.0f)),
      (3L, 1, Array(5.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val dir = staged("sil")("embeddings" -> emb)
    val out = SparkEntry.queries("q287_silhouette")(spark, dir)
      .collect().map(r => r.getAs[Int]("label") ->
        r.getAs[Double]("mean_silhouette")).toMap
    // label 0: a=0 (point IS its centroid), b=4 -> s=1
    assert(out(0) === 1.0)
    // label 1: centroid (4,0); s = (3-1)/3 and (5-1)/5 -> mean 0.7333
    assert(math.abs(out(1) - 0.7333) <= 1e-4)
  }

  test("q288 Brown-Forsythe: lower-median rank convention on even " +
      "counts, exact mean absolute deviations") {
    val ev = Seq(
      (1L, day(0), 1L, "a", 1.0, "{}"),
      (2L, day(0), 1L, "a", 2.0, "{}"),
      (3L, day(0), 1L, "a", 3.0, "{}"),
      (4L, day(0), 1L, "a", 4.0, "{}"),
      (5L, day(0), 1L, "b", 10.0, "{}"),
      (6L, day(0), 1L, "b", 20.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = staged("bf")("events" -> ev)
    val out = SparkEntry.queries("q288_brown_forsythe")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    // group a: n=4 -> target rank (4+1) DIV 2 = 2 -> lower median 2
    assert(out("a").getAs[Double]("median") === 2.0)
    // |1-2|,|2-2|,|3-2|,|4-2| -> mean 1.0
    assert(out("a").getAs[Double]("mean_absdev") === 1.0)
    // group b: n=2 -> target 1 -> median 10; |0|,|10| -> mean 5
    assert(out("b").getAs[Double]("median") === 10.0)
    assert(out("b").getAs[Double]("mean_absdev") === 5.0)
    assert(out("a").getAs[Long]("df1") === 1L)
    assert(out("a").getAs[Long]("df2") === 4L)
  }

  test("q291 dedup-discounted mix: a duplicated pair weighs as one " +
      "document in the effective shares") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa" +
      " lambda mu"
    val t2 = "one two three four five six seven eight nine ten eleven" +
      " twelve"
    val docs = Seq(
      (1L, t1, "en", "srcA", t1.length.toLong),
      (2L, t2, "en", "srcB", t2.length.toLong),
      (3L, t2, "en", "srcB", t2.length.toLong) // exact twin of doc 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("ddmix")("documents" -> docs)
    val out = SparkEntry.queries("q291_dedup_discounted_mix")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // raw: A=12 tokens, B=24; effective: the B twins weigh 12/2 each
    assert(out("srcA").getAs[Long]("raw_tokens") === 12L)
    assert(out("srcB").getAs[Long]("raw_tokens") === 24L)
    assert(out("srcA").getAs[Long]("n_clustered") === 0L)
    assert(out("srcB").getAs[Long]("n_clustered") === 2L)
    assert(out("srcA").getAs[Double]("eff_tokens") === 12.0)
    assert(out("srcB").getAs[Double]("eff_tokens") === 12.0)
    assert(out("srcA").getAs[Double]("raw_share") === 0.333333)
    assert(out("srcA").getAs[Double]("eff_share") === 0.5)
  }

  test("q286 mSPRT: the always-valid p sequence is monotone " +
      "non-increasing and within [0, 1]") {
    val rows = SparkEntry.queries("q286_msprt")(
      spark, "/root/testdata/sf0.001").orderBy("dt").collect()
    assert(rows.length > 5)
    val ps = rows.map(_.getAs[Double]("p_always_valid"))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    ps.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-12) }
    rows.foreach { r =>
      assert(r.getAs[Boolean]("reject") ===
        (r.getAs[Double]("p_always_valid") <= 0.05))
    }
  }

  test("q296 Cochran-Armitage: a perfect dose-response trend gives " +
      "z = 2 exactly on the hand-computed sufficient statistics") {
    // t=1: 0/2 finished, t=2: 1/2, t=3: 2/2
    // N=6 R=3 A=8 B=12 C=28 -> T = 8-0.5*12 = 2, Var = .25*(28-24) = 1
    def o(id: Long, pri: String, st: String) =
      (id, 1L, st, 100.0, day(id.toInt), pri)
    val orders = Seq(
      o(1, "1-URGENT", "O"), o(2, "1-URGENT", "O"),
      o(3, "2-HIGH", "F"), o(4, "2-HIGH", "O"),
      o(5, "3-MEDIUM", "F"), o(6, "3-MEDIUM", "F"))
    val dir = staged("ca")("orders" ->
      orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"))
    val r = SparkEntry.queries("q296_cochran_armitage")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_total") === 6L)
    assert(r.getAs[Long]("r_total") === 3L)
    assert(r.getAs[Double]("t_stat") === 2.0)
    assert(r.getAs[Double]("z") === 2.0)
    assert(r.getAs[Double]("chi2") === 4.0)
  }

  test("q297 Mann-Kendall: a strictly increasing series has S = " +
      "n(n-1)/2 and tau = 1") {
    val orders = (0 to 3).map(t => ((t + 1).toLong, 1L, "O",
      1000.0 * (t + 1), day(t), "1-URGENT"))
    val dir = staged("mk")("orders" ->
      orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"))
    val r = SparkEntry.queries("q297_mann_kendall")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("s_stat") === 6L)
    assert(r.getAs[Double]("kendall_tau") === 1.0)
    // no ties: Var = 4*3*13/18
    assert(math.abs(r.getAs[Double]("var_s") - 26.0 / 3.0) < 1e-3)
    assert(math.abs(r.getAs[Double]("z") - 5.0 / math.sqrt(26.0 / 3.0))
      < 1e-5)
  }

  test("q298 unseen mass: Chao1 and Good-Turing from hand counts") {
    // tokens "a a b c": V=3 N=4 F1=2 F2=1
    // chao1 = 3 + 2*1/(2*2) = 3.5; gt = 2/4 = 0.5
    val docs = Seq((1L, "a a b c", "en", "s1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("chao")("documents" -> docs)
    val r = SparkEntry.queries("q298_unseen_mass")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("vocab") === 3L)
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("f1") === 2L)
    assert(r.getAs[Long]("f2") === 1L)
    assert(r.getAs[Double]("chao1") === 3.5)
    assert(r.getAs[Double]("gt_unseen") === 0.5)
  }

  test("q299 Heaps fit: checkpoints are cumulative and the exponent " +
      "is a plausible growth rate") {
    val rows = SparkEntry.queries("q299_heaps_law")(
      spark, "/root/testdata/sf0.001").orderBy("k").collect()
    assert(rows.length === 10)
    val nt = rows.map(_.getAs[Long]("n_tokens"))
    val vb = rows.map(_.getAs[Long]("vocab"))
    nt.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    vb.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    // the synthetic corpus draws from a ~31-word vocabulary, so the
    // growth exponent legitimately saturates to 0 at every SF
    val beta = rows.head.getAs[Double]("beta")
    assert(beta >= 0.0 && beta <= 1.5)
    assert(rows.map(_.getAs[Double]("beta")).distinct.length === 1)
  }

  test("q300 isotonic calibration: PAV pools a violator and " +
      "preserves the weighted mean") {
    // rates by discount level: 0.5, 0.0, 1.0 -> iso 0.25, 0.25, 1.0
    def l(disc: Double, rf: String) = (disc, rf)
    val li = Seq(l(0.00, "R"), l(0.00, "N"),
      l(0.01, "N"), l(0.01, "N"),
      l(0.02, "R"), l(0.02, "R")).toDF("l_discount", "l_returnflag")
    val dir = staged("pav")("lineitem" -> li)
    val out = SparkEntry.queries("q300_isotonic_calibration")(spark, dir)
      .orderBy("discount_pct").collect()
    assert(out.map(_.getAs[Double]("iso_rate")).toSeq ===
      Seq(0.25, 0.25, 1.0))
    assert(out.map(_.getAs[Double]("emp_rate")).toSeq ===
      Seq(0.5, 0.0, 1.0))
    // monotone + mass-preserving (both PAV invariants)
    val iso = out.map(r =>
      r.getAs[Double]("iso_rate") * r.getAs[Long]("n"))
    assert(math.abs(iso.sum - 3.0) < 1e-9)
  }

  test("q301 Pareto frontier: dominated docs drop, incomparable docs " +
      "both survive") {
    val docs = Seq(
      (1L, "x y", "en", "s1", 3L), // (1.0, 2) dominated by doc 4
      (2L, "x x x y y z", "en", "s1", 11L), // (0.5, 6) survives
      (3L, "p p", "en", "s1", 3L), // (0.5, 2) dominated by doc 2
      (4L, "a b c", "en", "s1", 5L) // (1.0, 3) survives
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("sky")("documents" -> docs)
    val ids = SparkEntry.queries("q301_pareto_frontier")(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids === Set(2L, 4L))
  }

  test("q302 Cox PH: Wald and score agree in sign and the hazard " +
      "ratio is exp(beta)") {
    val r = SparkEntry.queries("q302_cox_ph")(
      spark, "/root/testdata/sf0.001").collect()(0)
    val beta = r.getAs[Double]("beta")
    val hr = r.getAs[Double]("hazard_ratio")
    assert(math.abs(hr - math.exp(beta)) < 1e-4)
    assert(r.getAs[Double]("score_z").sign === beta.sign)
    assert(r.getAs[Double]("wald_z").sign === beta.sign)
    assert(r.getAs[Double]("se") > 0.0)
    assert(r.getAs[Long]("dx_total") <= r.getAs[Long]("d_total"))
  }

  test("q303 Bradley-Terry: a source that wins every comparison " +
      "takes all the rating mass") {
    val docs = Seq(
      (1L, "u v", "en", "srcA", 3L), (2L, "c d", "en", "srcA", 3L),
      (3L, "w w", "en", "srcB", 3L), (4L, "z z", "en", "srcB", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("bt")("documents" -> docs)
    val out = SparkEntry.queries("q303_bradley_terry")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("srcA").getAs[Long]("wins") === 4L)
    assert(out("srcA").getAs[Long]("losses") === 0L)
    assert(out("srcB").getAs[Long]("wins") === 0L)
    assert(out("srcA").getAs[Double]("rating") === 2.0)
    assert(out("srcB").getAs[Double]("rating") === 0.0)
  }

  test("q351 seasonal strength: a pure weekly pattern with no trend " +
      "reads full seasonal strength and zero residual variance") {
    val orders = (0 until 28).map { t =>
      (t.toLong, 1L, 1000.0 * (t % 7 + 1), day(t))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val dir = staged("strength")("orders" -> orders)
    val r = SparkEntry.queries("q351_seasonal_strength")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_days") === 22L) // 28 minus edge half-windows
    assert(r.getAs[Double]("var_resid") === 0.0)
    assert(r.getAs[Double]("seasonal_strength") === 1.0)
    val fs = r.getAs[Double]("trend_strength")
    assert(fs >= 0.0 && fs <= 1.0)
  }

  test("q304 RBO: bounded in [0,1] and jaccard consistent with the " +
      "depth-20 overlap") {
    val r = SparkEntry.queries("q304_rbo_overlap")(
      spark, "/root/testdata/sf0.001").collect()(0)
    val ov = r.getAs[Long]("overlap_k")
    assert(ov >= 0L && ov <= 20L)
    val rbo = r.getAs[Double]("rbo")
    assert(rbo >= 0.0 && rbo <= 1.0)
    val j = ov.toDouble / (40.0 - ov.toDouble)
    assert(math.abs(r.getAs[Double]("jaccard_k") - j) < 1e-5)
  }

  test("q305 RMST: bounded by tau, and total deaths reconcile with " +
      "the log-rank margins") {
    val rows = SparkEntry.queries("q305_rmst")(
      spark, "/root/testdata/sf0.001").orderBy("arm").collect()
    assert(rows.map(_.getAs[Long]("arm")).toSeq === Seq(0L, 1L))
    rows.foreach { r =>
      val rmst = r.getAs[Double]("rmst_365")
      assert(rmst > 0.0 && rmst <= 365.0)
    }
    val lr = SparkEntry.queries("q266_logrank")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(rows.map(_.getAs[Long]("d_total")).sum ===
      lr.getAs[Long]("o1") + lr.getAs[Long]("o2"))
  }

  test("q306 Kneser-Ney: perplexity closes over avg_logprob and " +
      "OOV contexts are a subset of unseen bigrams") {
    val r = SparkEntry.queries("q306_kneser_ney")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(r.getAs[Long]("btypes") > 0L)
    assert(r.getAs[Long]("n_test") > 0L)
    assert(r.getAs[Long]("oov_contexts") <=
      r.getAs[Long]("unseen_bigrams"))
    val avg = r.getAs[Double]("avg_logprob")
    assert(avg < 0.0)
    assert(math.abs(r.getAs[Double]("perplexity") - math.exp(-avg))
      < 1e-2)
  }

  test("q307 LOSO influence: a two-source corpus splits influence " +
      "antisymmetrically around the overall mean") {
    val docs = Seq(
      (1L, "a b", "en", "srcA", 3L), // ratio 1.0
      (2L, "c c", "en", "srcB", 3L) // ratio 0.5
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("loso")("documents" -> docs)
    val out = SparkEntry.queries("q307_loso_influence")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("srcA").getAs[Double]("overall_mean") === 0.75)
    assert(out("srcA").getAs[Double]("loso_mean") === 0.5)
    assert(out("srcA").getAs[Double]("influence") === 0.25)
    assert(out("srcB").getAs[Double]("loso_mean") === 1.0)
    assert(out("srcB").getAs[Double]("influence") === -0.25)
  }

  test("q308 CKA: a +-1-valued embedding equals its own sign " +
      "quantization, so CKA is exactly 1") {
    val emb = Seq(
      (1L, 0, Array(1.0f, 1.0f)),
      (2L, 0, Array(1.0f, -1.0f)),
      (3L, 0, Array(-1.0f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
    val dir = staged("cka")("embeddings" -> emb)
    val r = SparkEntry.queries("q308_cka_quantization")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("dim") === 2L)
    assert(r.getAs[Double]("cka_linear") === 1.0)
    assert(r.getAs[Double]("fro_xx") === r.getAs[Double]("fro_yy"))
  }

  test("q309 greedy coverage: marginal gains, early stop, and the " +
      "doc_id tie-break on a hand corpus") {
    val docs = Seq(
      (1L, "a b c d", "en", "s1", 7L),
      (2L, "c d e", "en", "s1", 5L),
      (3L, "e f", "en", "s1", 3L),
      (4L, "a b", "en", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = staged("greedy")("documents" -> docs)
    val out = SparkEntry.queries("q309_greedy_coverage")(spark, dir)
      .orderBy("round").collect()
    // round 1: doc 1 covers 4 of 6; round 2: doc 3 adds {e, f};
    // round 3: every remaining doc has gain 0 -> stop at 2 rows
    assert(out.length === 2)
    assert(out(0).getAs[Long]("doc_id") === 1L)
    assert(out(0).getAs[Long]("gain") === 4L)
    assert(out(1).getAs[Long]("doc_id") === 3L)
    assert(out(1).getAs[Long]("gain") === 2L)
    assert(out(1).getAs[Long]("covered_words") === 6L)
    assert(out(1).getAs[Double]("coverage") === 1.0)
  }

  test("q310 SNIPS: IPS and SNIPS reconcile through the matched " +
      "count and the uniform-propensity K") {
    val rows = SparkEntry.queries("q310_snips_offpolicy")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nT = r.getAs[Long]("n_test").toDouble
      val nM = r.getAs[Long]("n_matched").toDouble
      assert(nM <= nT)
      val ips = r.getAs[Double]("ips_value")
      val snips = r.getAs[Double]("snips_value")
      assert(snips >= 0.0)
      // ips = snips * n_matched * K / n_test (K = distinct train
      // actions; recover K from the identity, must be a near-integer)
      if (nM > 0 && snips > 0) {
        val k = ips * nT / (snips * nM)
        assert(math.abs(k - math.round(k)) < 0.01)
      }
    }
  }

  test("q311 caliper matching: nearest control wins, out-of-caliper " +
      "treated stay unmatched") {
    import org.apache.spark.sql.functions.{col => c}
    // discover arm assignments from the engine's own hash so the
    // fixture can place one treated between two controls
    val arms = spark.range(1, 40)
      .select(c("id"), (graft.operators.Sampling
        .hashBucket(c("id"), "att", 2) === 0).as("t"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val tKey = arms.collect { case (k, true) => k }.min
    val ctls = arms.collect { case (k, false) => k }.toSeq.sorted.take(2)
    val (c1, c2) = (ctls(0), ctls(1))
    // T at $100.00; C1 at $100.50 (50 cents away), C2 at $95.00
    val cust = Seq(
      (tKey, "t", 0, 100.00, "A"),
      (c1, "c1", 0, 100.50, "A"),
      (c2, "c2", 0, 95.00, "A")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
    val orders = Seq(
      (1L, tKey, "O", 300.0, day(0), "1-URGENT"),
      (2L, c1, "O", 100.0, day(1), "1-URGENT"),
      (3L, c2, "O", 999.0, day(2), "1-URGENT")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val dir = staged("att")("customer" -> cust, "orders" -> orders)
    val r = SparkEntry.queries("q311_caliper_matching")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_treated") === 1L)
    assert(r.getAs[Long]("n_control") === 2L)
    assert(r.getAs[Long]("n_matched") === 1L)
    // nearest control is C1 (50 cents vs 500): ATT = 300 - 100
    assert(r.getAs[Double]("att") === 200.0)
    assert(r.getAs[Double]("naive_diff") === 300.0 - (100.0 + 999.0) / 2)
  }

  test("q312 doubly-robust: shares q310's target policy exactly, " +
      "and DM is the train-mean model") {
    val dr = SparkEntry.queries("q312_doubly_robust")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("seg") -> r).toMap
    val ips = SparkEntry.queries("q310_snips_offpolicy")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("seg") -> r).toMap
    assert(dr.keySet === ips.keySet)
    dr.foreach { case (seg, r) =>
      assert(r.getAs[String]("pi_a") === ips(seg).getAs[String]("pi_a"))
      assert(r.getAs[Long]("n_test") === ips(seg).getAs[Long]("n_test"))
      assert(r.getAs[Double]("dm_value") > 0.0)
    }
  }

  test("q313 Nelson-Aalen: cumulative hazard is non-decreasing and " +
      "Breslow survival dominates Kaplan-Meier (1-x <= e^-x)") {
    val na = SparkEntry.queries("q313_nelson_aalen")(
      spark, "/root/testdata/sf0.001").orderBy("t_days").collect()
    val km = SparkEntry.queries("q205_kaplan_meier")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[Long]("t_days") -> r.getAs[Double]("survival"))
      .toMap
    assert(na.length > 10)
    var prev = 0.0
    na.foreach { r =>
      val h = r.getAs[Double]("cum_hazard")
      assert(h >= prev - 1e-9)
      prev = h
      val b = r.getAs[Double]("breslow_survival")
      val k = km(r.getAs[Long]("t_days"))
      assert(b >= k - 1e-6)
    }
  }

  test("q314 effective rank: a 1-D subspace scores 1, an isotropic " +
      "square scores the full dimension") {
    val oneD = Seq(
      (1L, 0, Array(2.0f, 0.0f)),
      (2L, 0, Array(-2.0f, 0.0f)),
      (3L, 0, Array(0.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val d1 = staged("erank1")("embeddings" -> oneD)
    val r1 = SparkEntry.queries("q314_effective_rank")(spark, d1)
      .collect()(0)
    assert(r1.getAs[Double]("effective_rank") === 1.0)
    val iso = Seq(
      (1L, 0, Array(1.0f, 1.0f)), (2L, 0, Array(1.0f, -1.0f)),
      (3L, 0, Array(-1.0f, 1.0f)), (4L, 0, Array(-1.0f, -1.0f))
    ).toDF("vec_id", "label", "embedding")
    val d2 = staged("erank2")("embeddings" -> iso)
    val r2 = SparkEntry.queries("q314_effective_rank")(spark, d2)
      .collect()(0)
    assert(r2.getAs[Double]("effective_rank") === 2.0)
  }

  test("q315 LSH planner: the S-curve threshold rises and expected " +
      "catch falls monotonically as banding gets stricter") {
    val rows = SparkEntry.queries("q315_lsh_planner")(
      spark, "/root/testdata/sf0.001").orderBy(col("b").desc).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("b") * r.getAs[Long]("r") === 12L)
      val c = r.getAs[Double]("exp_catch_all")
      assert(c >= 0.0 && c <= 1.0)
    }
    val sstars = rows.map(_.getAs[Double]("s_star"))
    sstars.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    val catches = rows.map(_.getAs[Double]("exp_catch_all"))
    catches.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9) }
  }

  test("q290 seasonal decomposition: additive identity holds on the " +
      "rounded output and exactly 10 anomalies emit") {
    val rows = SparkEntry.queries("q290_seasonal_decompose")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val lhs = r.getAs[Double]("revenue") - r.getAs[Double]("trend") -
        r.getAs[Double]("seasonal")
      // each term is rounded independently (revenue at 6 dp, the rest
      // at 4 dp) -> identity holds to ~2 quanta
      assert(math.abs(lhs - r.getAs[Double]("residual")) <= 3e-4)
    }
  }
}
