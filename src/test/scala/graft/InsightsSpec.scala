package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Assoc, Chunks, Dedup, Experiment, Fuzzy, Graph,
  History, Quality, Rank, Sampling, Series, Similarity, Sketch}

/** Unit coverage for the round-5 insight operators: blocked
  * sorted-neighborhood linkage, retention cohorts, rolling z-score
  * anomalies.
  */
class InsightsSpec extends SparkSpec {
  import spark.implicits._

  private def staged(name: String)
      (tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_insights_$name").toString
    tables.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  // ----------------------------------------------- benford / theil-sen
  test("q243 Benford: hand-computed digit table and quantized chi2") {
    // totals 1000 x3 and 2000 x1: digits {1: 3, 2: 1}, obs .75/.25
    val orders = (Seq.fill(3)(1000.0) ++ Seq(2000.0)).toDF("o_totalprice")
    val dir = staged("benford")("orders" -> orders)
    val rows = SparkEntry.queries("q243_benford_audit")(spark, dir)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(rows.map(_.getLong(1)).toSeq == Seq(3L, 1L))
    assert(rows(0).getDouble(2) == 0.75 && rows(1).getDouble(2) == 0.25)
    assert(rows(0).getDouble(3) == 0.30103)   // log10(2) at the grid
    assert(rows(1).getDouble(3) == 0.176091)  // log10(3/2)
    // replicate the engine's quantized family chi2 exactly
    def expU(dd: Int) = math.floor(math.log10(1.0 + 1.0 / dd) * 1e9 + 0.5)
    def tU(n: Long, dd: Int) = {
      val e = expU(dd) / 1e9
      math.floor((n / 4.0 - e) * (n / 4.0 - e) / e * 4.0 * 1e6 + 0.5).toLong
    }
    val want = (tU(3, 1) + tU(1, 2)) / 1e6
    val got = rows(0).getDouble(4)
    assert(math.abs(got - want) < 1e-6, s"chi2 $got vs $want")
    assert(rows.forall(_.getDouble(4) == got),
      "chi2_family must be a family-wide constant")
  }

  test("q250 Theil-Sen: a perfect line survives one wild outlier day") {
    // c(d) = 100 + 50d cents over 10 days; day 5 replaced by 1e6 cents.
    // 36 of 45 pairwise slopes are exactly 50 -> median slope 50;
    // 9 of 10 residuals are exactly 100 -> lower median intercept 100.
    val rows = (0 until 10).map { dd =>
      val cents = if (dd == 5) 1000000L else 100L + 50L * dd
      (java.sql.Date.valueOf(java.time.LocalDate.of(1996, 1, 1)
        .plusDays(dd)), cents / 100.0)
    }.toDF("l_shipdate", "l_extendedprice")
    val dir = staged("theilsen")("lineitem" -> rows)
    val r = SparkEntry.queries("q250_theil_sen")(spark, dir).collect()(0)
    assert(r.getLong(0) == 10L)   // n_days
    assert(r.getLong(1) == 45L)   // n_pairs
    assert(r.getDouble(2) == 50.0, s"slope=${r.getDouble(2)}")
    assert(r.getDouble(3) == 100.0, s"intercept=${r.getDouble(3)}")
  }

  test("weightedQuantiles: mass-weighted median, exact rational ranks") {
    // values 1 (w=1), 2 (w=1), 3 (w=8): W=10. p50 target ceil(10/2)=5
    // -> value 3; p90 target exactly 9 (the FP-ceil trap: 0.9*10 must
    // not round to 10) -> value 3; p10 target 1 -> value 1
    val rows = Seq((1L, 1L), (2L, 1L), (3L, 8L)).toDF("v", "w")
    val out = graft.operators.Quality.weightedQuantiles(rows, "v", "w",
      Seq(("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("p10", 1L, 1L), ("p50", 5L, 3L),
      ("p90", 9L, 3L)), out.toSeq.toString)
  }

  test("weightedQuantiles / groupedRankQuantiles: bucket count never " +
      "changes the answer; empty input yields empty, not a crash") {
    val rows = (1L to 100L).map(v => (v, v % 7 + 1)).toDF("v", "w")
    val a = graft.operators.Quality.weightedQuantiles(rows, "v", "w",
      Seq(("p50", 1, 2), ("p90", 9, 10)), buckets = 1).collect().toSeq
    val b = graft.operators.Quality.weightedQuantiles(rows, "v", "w",
      Seq(("p50", 1, 2), ("p90", 9, 10)), buckets = 16).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq),
      s"bucketing must be parallelism-only:\n$a\n$b")
    val g = (1L to 100L).map(v => ("g1", v.toDouble)) ++
      (1L to 50L).map(v => ("g2", v.toDouble))
    val gdf = g.toDF("g", "v")
    val r1 = graft.operators.Quality.groupedRankQuantiles(gdf, "g", "v",
      Seq((1, 2)), buckets = 1).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    val r16 = graft.operators.Quality.groupedRankQuantiles(gdf, "g", "v",
      Seq((1, 2)), buckets = 16).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    // rank max(1, ceil(n/2)): g1 n=100 -> rank 50 -> 50.0; g2 -> 25.0
    assert(r1 == Map("g1" -> 50.0, "g2" -> 25.0), r1.toString)
    assert(r1 == r16)
    val empty = rows.filter(col("v") < 0)
    assert(graft.operators.Quality.weightedQuantiles(empty, "v", "w",
      Seq(("p50", 1, 2))).isEmpty)
    assert(graft.operators.Quality.groupedRankQuantiles(
      gdf.filter(col("v") < 0), "g", "v", Seq((1, 2))).isEmpty)
  }

  test("q255 Durbin-Watson: orthogonal alternating residuals give " +
      "exactly dw = 2") {
    // c = 10000 + 200d + 100*(+,-,-,+) cents: the noise block is
    // orthogonal to [1, d], so OLS recovers slope 200 EXACTLY and the
    // residuals are exactly the pattern; diffs (-2,0,2,...) give
    // num = 16, den = 8 -> dw = 2.0, rho = 0
    val pat = Seq(1L, -1L, -1L, 1L)
    val rows = (0 until 8).map { dd =>
      val cents = 10000L + 200L * dd + 100L * pat(dd % 4)
      (java.sql.Date.valueOf(java.time.LocalDate.of(1996, 1, 1)
        .plusDays(dd)), cents / 100.0)
    }.toDF("l_shipdate", "l_extendedprice")
    val dir = staged("dw")("lineitem" -> rows)
    val r = SparkEntry.queries("q255_durbin_watson")(spark, dir)
      .collect()(0)
    assert(r.getLong(0) == 8L)
    assert(r.getDouble(1) == 2.0, s"slope=${r.getDouble(1)}")
    assert(r.getDouble(2) == 2.0, s"dw=${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.0)
  }

  test("q256 JL audit: ratios land in a plausible k=8 band") {
    val r = SparkEntry.queries("q256_jl_projection")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(r.getLong(0) > 0)
    val mean = r.getDouble(1)
    assert(mean > 0.2 && mean < 3.0, s"mean_ratio=$mean")
    assert(r.getDouble(2) <= mean && mean <= r.getDouble(3))
    val frac = r.getDouble(4)
    assert(frac >= 0.0 && frac <= 1.0)
  }

  test("q258 backtest: a pure linear trend is forecast perfectly " +
      "(skill exactly 0)") {
    // daily count = 10 + 2*dd: with l=x1, b=x2-x1 init the alpha=.5
    // fold keeps l=x_t, b=2 exactly, so every one-step forecast is
    // exact -> mae_holt = 0; the naive carry-forward always misses by
    // the slope -> mae_naive = 2, skill = 0
    val rows = (0 until 30).flatMap { dd =>
      (0 until 10 + 2 * dd).map { j =>
        (dd.toLong * 1000 + j,
          java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
            .plusDays(dd).atStartOfDay().plusHours(1)),
          j.toLong, "click", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = staged("backtest")("events" -> rows)
    val r = SparkEntry.queries("q258_forecast_backtest")(spark, dir)
      .collect()(0)
    assert(r.getLong(1) == 22L)
    assert(r.getDouble(2) == 0.0, s"mae_holt=${r.getDouble(2)}")
    assert(r.getDouble(3) == 2.0, s"mae_naive=${r.getDouble(3)}")
    assert(r.getDouble(4) == 0.0)
  }

  // ----------------------------------------------- sorted neighborhood
  test("snm pairs rank-adjacent near-duplicates and verifies distance") {
    val rows = Seq(
      (1L, "alpha centauri"),
      (2L, "alpha centauri x"), // dist 2 from row 1, same block
      (3L, "alpha zebra"),      // same block, far from both
      (4L, "beta orion")        // different block
    ).toDF("id", "s")
    val out = Fuzzy.sortedNeighborhoodPairs(rows, "id", "s",
      blockLen = 4, window = 3, maxDist = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(out.head.getInt(4) == 2)
  }

  test("snm never pairs across blocks, even at distance 0") {
    // identical strings except the first character → different blocks
    val rows = Seq((1L, "aaaa tail"), (2L, "baaa tail")).toDF("id", "s")
    val out = Fuzzy.sortedNeighborhoodPairs(rows, "id", "s",
      blockLen = 4, window = 3, maxDist = 2)
    assert(out.isEmpty)
  }

  test("snm window bounds candidate fan-out") {
    // five same-block strings in sort order; w=1 pairs only neighbors
    val rows = (1 to 5).map(i => (i.toLong, s"blk $i")).toDF("id", "s")
    val out = Fuzzy.sortedNeighborhoodPairs(rows, "id", "s",
      blockLen = 4, window = 1, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
  }

  // ----------------------------------------------- retention cohorts
  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")

  test("retention cohorts: offsets count returning users, rate is share") {
    // epoch weeks: 2024-01-01 is a Monday; days 1-7 one week, 8-14 next
    val events = Seq(
      (1L, ts(1)), (1L, ts(8)),  // u1: cohort w, returns w+1
      (2L, ts(2)),               // u2: cohort w only
      (3L, ts(9))                // u3: cohort w+1
    ).toDF("user_id", "ts")
    val out = Series.retentionCohorts(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
    val byKey = out.map(r => ((r.getLong(0), r.getLong(1)),
      (r.getLong(2), r.getDouble(3)))).toMap
    val w0 = out.map(_.getLong(0)).min
    assert(byKey((w0, 0L)) == ((2L, 1.0)))   // u1,u2 in first cohort
    assert(byKey((w0, 1L)) == ((1L, 0.5)))   // u1 returns
    assert(byKey((w0 + 1, 0L)) == ((1L, 1.0))) // u3's own cohort
    assert(out.length == 3)
  }

  test("cusum changepoint lands on the last day of the old regime") {
    // 5 days at 1/day then 5 days at 3/day: D_t = |10·S_t − 20t| peaks
    // at t=5 (D=50) → cp_day = day 5, cusum = 50/(10·20) = 0.25
    val rows = (1 to 5).map(d => ("shift", ts(d))) ++
      (6 to 10).flatMap(d => Seq.fill(3)(("shift", ts(d))))
    val r = Series.cusumChangepoint(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()(0)
    assert(r.getLong(1) == 10L && r.getLong(2) == 20L)
    assert(r.getDate(3).toString == "2024-01-05")
    assert(r.getDouble(4) == 0.25)
  }

  test("cusum: constant series scores 0 at the earliest day; gaps count") {
    val flat = (1 to 4).map(d => ("c", ts(d))).toDF("event_type", "ts")
    val rf = Series.cusumChangepoint(flat, "event_type", "ts").collect()(0)
    assert(rf.getDouble(4) == 0.0 && rf.getDate(3).toString == "2024-01-01")
    // events only on days 1 and 10 → 8 silent days are real zeros
    val sparse = Seq(("g", ts(1)), ("g", ts(10))).toDF("event_type", "ts")
    val rs = Series.cusumChangepoint(sparse, "event_type", "ts").collect()(0)
    assert(rs.getLong(1) == 10L) // gap-filled span, not 2 observed days
  }

  test("holtForecast extrapolates a linear weekly ramp exactly") {
    // weekly volumes 1,2,3 → l=3, b=1, forecast 4 (hand-unrolled fold)
    val ev = (Seq(1) ++ Seq(8, 9) ++ Seq(15, 16, 17))
      .map(d => ("t", ts(d))).toDF("event_type", "ts")
    val r = Series.holtForecast(ev, "event_type", "ts").collect()(0)
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 4.0)
  }

  test("holtForecast: silent weeks gap-fill; single-week series dropped") {
    // weeks 0 and 2 active, week 1 silent → n_weeks = 3
    val gap = Seq(("g", ts(1)), ("g", ts(16))).toDF("event_type", "ts")
    assert(Series.holtForecast(gap, "event_type", "ts")
      .collect()(0).getLong(1) == 3L)
    val single = Seq(("s", ts(2))).toDF("event_type", "ts")
    assert(Series.holtForecast(single, "event_type", "ts").isEmpty)
    intercept[IllegalArgumentException] {
      Series.holtForecast(gap, "event_type", "ts", alpha = 0.3)
    }
  }

  test("holtWintersDaily: weekly spike decomposes to flat level + exact seasonal") {
    // days 1..14, one event/day except days 1 and 8 (same dow) get 8:
    // per-dow means are (8,1,1,1,1,1,1), overall mean 2 → s_peak = 6,
    // s_other = −1; deseasonalized series is flat 2 → l = 2, b = 0;
    // day 15 shares the peak dow → forecast = 2 + 0 + 6 = 8
    val ev = (1 to 14).flatMap { d =>
      val n = if (d == 1 || d == 8) 8 else 1
      Seq.fill(n)(("t", ts(d)))
    }.toDF("event_type", "ts")
    val r = Series.holtWintersDaily(ev, "event_type", "ts").collect()(0)
    assert(r.getLong(1) == 14L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 6.0 && r.getDouble(5) == 8.0)
  }

  test("rollingCorrelation: perfectly coupled series hit +1, opposed -1") {
    // a = [1,2,3,4], b = 2a → r = 1 over any window
    val pos = (1 to 4).flatMap { d =>
      Seq.fill(d)(("click", ts(d))) ++ Seq.fill(2 * d)(("purchase", ts(d)))
    }
    val rp = Series.rollingCorrelation(pos.toDF("event_type", "ts"),
      "event_type", "ts", "click", "purchase", window = 3)
      .orderBy("day").collect()
    assert(rp.length == 2) // days 3 and 4 have full windows
    assert(rp.forall(_.getDouble(3) == 1.0))
    // anti-coupled: a rises 1,2,3 while b falls 3,2,1 → r = -1
    val neg = (1 to 3).flatMap { d =>
      Seq.fill(d)(("click", ts(d))) ++ Seq.fill(4 - d)(("purchase", ts(d)))
    }
    val rn = Series.rollingCorrelation(neg.toDF("event_type", "ts"),
      "event_type", "ts", "click", "purchase", window = 3).collect()
    assert(rn.length == 1 && rn(0).getDouble(3) == -1.0)
  }

  test("rollingCorrelation: zero-variance window yields NULL, gaps are 0s") {
    // click constant (1/day); purchase varies → da = 0 → NULL
    val rows = (1 to 3).flatMap { d =>
      Seq(("click", ts(d))) ++ Seq.fill(d)(("purchase", ts(d)))
    }
    val r = Series.rollingCorrelation(rows.toDF("event_type", "ts"),
      "event_type", "ts", "click", "purchase", window = 3).collect()
    assert(r.length == 1 && r(0).isNullAt(3))
    // purchase absent entirely → gap-filled zeros, also zero variance
    val solo = (1 to 3).map(d => ("click", ts(d)))
      .toDF("event_type", "ts")
    val rs = Series.rollingCorrelation(solo, "event_type", "ts",
      "click", "purchase", window = 3).collect()
    assert(rs.length == 1 && rs(0).getLong(2) == 0L && rs(0).isNullAt(3))
  }

  // ----------------------------------------------- rolling anomalies
  test("rolling anomalies: spike flags, baseline excludes current day") {
    // 9 calm days of 10 events then a day of 100
    val events = (1 to 9).flatMap(d => (1 to 10).map(i =>
      ("click", ts(d)))) ++ (1 to 100).map(i => ("click", ts(10)))
    val out = Series.rollingAnomalies(events.toDF("event_type", "ts"),
        "event_type", "ts", lookback = 7, zThresh = 3.0, minBase = 3)
      .orderBy("day").collect()
    // calm days: sd = 0 → z null, never anomalous
    out.take(9).foreach { r =>
      assert(r.isNullAt(6), s"calm day z should be null: $r")
      assert(!r.getBoolean(7))
    }
    // spike day: baseline is the 7 calm days before it (mean 10, sd 0)
    // → sd = 0 means z undefined there too; widen one count to get
    // spread and re-check the flag fires
    val varied = events.toDF("event_type", "ts")
      .union(Seq(("click", ts(3))).toDF("event_type", "ts"))
    val out2 = Series.rollingAnomalies(varied, "event_type", "ts",
        lookback = 7, zThresh = 3.0, minBase = 3)
      .orderBy("day").collect()
    val spike = out2.last
    assert(spike.getLong(2) == 100L)
    assert(spike.getBoolean(7), s"spike day must flag: $spike")
    // baseline mean on the spike day ignores the spike itself
    assert(spike.getDouble(4) < 11.0)
  }

  test("rolling anomalies: a silent day is scored, not skipped") {
    // 8 noisy-but-high days (so sd > 0), then one day with ZERO events:
    // the gap-filled grid must produce a cnt=0 row, baseline from the
    // trailing CALENDAR days, and flag the collapse
    val events = (1 to 9).flatMap(d =>
      (1 to (100 + d % 2)).map(_ => ("click", ts(d)))) // ~100±1/day
    val withSpan = events ++ Seq(("click", ts(11))) // day 10 is silent
    val out = Series.rollingAnomalies(withSpan.toDF("event_type", "ts"),
        "event_type", "ts", lookback = 7, zThresh = 3.0, minBase = 3)
      .orderBy("day").collect()
    // all 11 calendar days present — including the day-10 gap
    assert(out.length == 11, s"expected dense grid: ${out.length}")
    val day10 = out(9)
    assert(day10.getLong(2) == 0L, s"gap day must carry cnt=0: $day10")
    assert(day10.getBoolean(7),
      s"volume collapse to zero must flag as anomaly: $day10")
  }

  // ----------------------------------------------- reciprocal rank fusion
  test("rrf fuses two lists by summed reciprocal rank") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Rank.rrfFuse(Seq(a, b), "id", "rank", k0 = 60)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    def rr(rs: Int*): Double = graft.functions.Rounding.roundTo(
      rs.map(r => 1.0 / (60 + r)).sum, 6)
    assert(out(20L) == ((rr(2, 1), 2L, 1L))) // in both lists
    assert(out(10L) == ((rr(1), 1L, 1L)))
    assert(out(40L) == ((rr(2), 1L, 2L)))
    // doc in both lists outranks any single-list doc here
    assert(out(20L)._1 > out(10L)._1)
  }

  // ----------------------------------------------- sliding chunks
  test("sliding chunks cover the document with the declared overlap") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = Chunks.slidingChunks(Seq((1L, text)).toDF("id", "text"),
        "id", "text", size = 32, stride = 24)
      .orderBy("chunk_idx").collect()
    // 1 + ceil((100-32)/24) = 1 + ceil(68/24) = 4 chunks
    assert(out.length == 4)
    assert(out.map(_.getInt(2)).toSeq == Seq(32, 32, 32, 100 - 3 * 24))
    // fingerprints differ (overlap < size)
    assert(out.map(_.getString(3)).distinct.length == 4)
  }

  test("sliding chunks: short and empty docs yield exactly one chunk") {
    val out = Chunks.slidingChunks(
        Seq((1L, "just three words"), (2L, ""), (3L, null.asInstanceOf[String]))
          .toDF("id", "text"),
        "id", "text", size = 32, stride = 24)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    // null text drops; empty text is the single empty-token chunk
    assert(out.toSeq.sorted == Seq(1L -> 0, 2L -> 0))
  }

  // ----------------------------------------------- equi-depth histogram
  test("equi-depth histogram balances counts and orders ranges") {
    val df = (1 to 800).map(i => Tuple1(i.toDouble)).toDF("v")
    val out = Quality.equiDepthHistogram(df, "v", k = 8)
      .orderBy("bin").collect()
    assert(out.length == 8)
    assert(out.map(_.getLong(1)).sum == 800L)
    // near-equal depth on a uniform column
    out.foreach(r => assert(math.abs(r.getLong(1) - 100L) <= 1,
      s"unbalanced bin: $r"))
    // ranges tile in order without overlap
    val los = out.map(_.getDouble(2)); val his = out.map(_.getDouble(3))
    (1 until 8).foreach(i => assert(los(i) > his(i - 1)))
  }

  // ----------------------------------------------- triangle counting
  test("triangle counts: K4 gives every node C(3,2)=3 triangles") {
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield
      (a.toLong, b.toLong)).toDF("a", "b")
    val out = Graph.triangleCounts(k4, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle counts ignore duplicate/reversed edges and open wedges") {
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (1L, 3L), // one triangle
      (3L, 4L), (4L, 5L)                                 // open path
    ).toDF("a", "b")
    val out = Graph.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ----------------------------------------------- self-join forecast
  test("self-join forecast: exact pairs is the sum of squared counts") {
    // key 1 ×3, key 2 ×2, key 3 ×1 → 9 + 4 + 1 = 14
    val df = Seq(1, 1, 1, 2, 2, 3).map(Tuple1(_)).toDF("k")
    val r = Quality.selfJoinForecast(df, "k", sampleMod = 1).collect()(0)
    assert(r.getLong(0) == 14L)         // exact
    assert(r.getLong(1) == 14L)         // sampleMod=1 → estimate exact
    assert(r.getDouble(2) == 0.0)       // rel_err
    assert(r.getLong(3) == 6L && r.getLong(4) == 3L && r.getLong(5) == 3L)
  }

  // ----------------------------------------------- welch A/B
  test("welch A/B matches hand-computed moments for the hash arms") {
    val rows = (1L to 40L).map(u => (u, "seg", u.toDouble % 7))
    val df = rows.toDF("user_id", "seg", "value")
    // recover the deterministic arm of each unit, then compute expected
    val arms = df.select(col("user_id"),
        Sampling.hashBucket(col("user_id"), "ab", 2).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (a, b) = rows.partition(r => arms(r._1) == 0L)
    def stats(xs: Seq[Double]): (Double, Double) = {
      val n = xs.length.toDouble
      val m = xs.sum / n
      (m, math.max((xs.map(x => x * x).sum / n - m * m) * n / (n - 1), 0.0))
    }
    val (ma, va) = stats(a.map(_._3)); val (mb, vb) = stats(b.map(_._3))
    val se = math.sqrt(va / a.length + vb / b.length)
    val out = Experiment.welchAb(df, "user_id", "value", "seg").collect()(0)
    assert(out.getLong(1) == a.length && out.getLong(2) == b.length)
    assert(out.getDouble(3) == graft.functions.Rounding.roundTo(ma, 4))
    assert(out.getDouble(4) == graft.functions.Rounding.roundTo(mb, 4))
    assert(out.getDouble(6) == graft.functions.Rounding.roundTo(se, 6))
    assert(out.getDouble(7) ==
      graft.functions.Rounding.roundTo((ma - mb) / se, 4))
  }

  test("welch A/B: degenerate arms yield null z, small segments drop") {
    val df = Seq(
      (1L, "flat", 5.0), (2L, "flat", 5.0), (3L, "flat", 5.0),
      (4L, "flat", 5.0), (5L, "flat", 5.0), (6L, "flat", 5.0),
      (1L, "tiny", 1.0)
    ).toDF("user_id", "seg", "value")
    val out = Experiment.welchAb(df, "user_id", "value", "seg").collect()
    assert(out.length == 1 && out(0).getString(0) == "flat")
    assert(out(0).isNullAt(7)) // zero spread in both arms → z undefined
  }

  // ----------------------------------------------- hard negatives
  test("hard negatives exclude same-label vectors and rank by cosine") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(0.9f, 0.1f), 1),  // same label as query — excluded
      (2L, Seq(0.8f, 0.2f), 2),  // best cross-label
      (3L, Seq(0.0f, 1.0f), 2),  // orthogonal cross-label
      (4L, Seq(0.5f, 0.5f), 3)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs,
        vecs.filter(col("vec_id") === 0), "vec_id", "embedding", "label",
        k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 4L))
    assert(!out.map(_.getLong(1)).contains(1L))
    assert(out.forall(r => r.getInt(3) != 1)) // neighbor_label != query's
  }

  // ----------------------------------------------- snapshot diff
  test("snapshot diff reports all four statuses with changed columns") {
    val old = Seq((1L, 2L, 10.0), (2L, 1L, 5.0), (3L, 4L, 7.0))
      .toDF("k", "n", "t")
    val nw = Seq((1L, 2L, 10.0), (2L, 3L, 5.0), (4L, 1L, 1.0))
      .toDF("k", "n", "t")
    val out = History.snapshotDiff(old, nw, "k", Seq("n", "t"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.getString(2))))).toMap
    assert(out(1L) == (("unchanged", Some(""))))
    assert(out(2L) == (("changed", Some("n"))))
    assert(out(3L) == (("removed", None)))
    assert(out(4L) == (("added", None)))
  }

  test("snapshot diff is null-safe: null→value changes, null→null doesn't") {
    val old = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("k", "n")
    val nw = Seq((1L, Option.empty[Long]), (2L, Some(9L))).toDF("k", "n")
    val out = History.snapshotDiff(old, nw, "k", Seq("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed"))
  }

  // ----------------------------------------------- label propagation
  test("label propagation keeps bridged cliques in distinct communities") {
    // two triangles {1,2,3} and {10,11,12} joined by bridge 3-10:
    // min-propagation (connected components) would merge them; LPA's
    // frequency vote must not
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (3L, 10L)
    ).toDF("a", "b")
    // 2 sync rounds leave the bridge-adjacent vertex half-converged
    // (the min tie-break keeps re-injecting the bridge label); by
    // round 3 each clique's frequency vote has settled
    val out = Graph.labelPropagation(edges, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = Set(1L, 2L, 3L).map(out)
    val right = Set(10L, 11L, 12L).map(out)
    assert(left.size == 1, s"left clique should agree: $out")
    assert(right.size == 1, s"right clique should agree: $out")
    assert(left != right, s"bridge must not merge cliques: $out")
  }

  // ----------------------------------------------- PSI drift
  test("psi is ~0 for identical distributions, positive under shift") {
    val ref = (1 to 400).map(i => Tuple1(i.toDouble)).toDF("v")
    val same = Quality.psiDrift(ref, ref, "v", k = 8).collect()
    assert(same.length == 8)
    // identical data + same smoothing → every term is exactly 0
    same.foreach(r => assert(r.getDouble(5) == 0.0, s"nonzero term: $r"))
    // shifted current: mass leaves low bins for the top bin
    val cur = (1 to 400).map(i => Tuple1(i.toDouble + 300)).toDF("v")
    val drift = Quality.psiDrift(ref, cur, "v", k = 8).collect()
    val psi = drift.map(_.getDouble(5)).sum
    assert(psi > 0.25, s"strong shift must trip the PSI alarm: $psi")
    // empty current bins stay finite thanks to smoothing
    assert(drift.forall(r => !r.getDouble(5).isInfinite))
    assert(drift.exists(r => r.getLong(2) == 0L))
  }

  test("psi sees current rows landing in ref-empty collapsed bins") {
    // heavy ties: 90% of ref mass sits on one value, so the k=4
    // quantile boundaries collapse and most bins hold zero ref rows;
    // current rows landing there must be REPORTED, not dropped
    // bounds collapse to [5, 5, 50]: bin 1 is unreachable, bin 3
    // (x > 50) holds zero ref rows but IS reachable by current data
    val ref = ((1 to 280).map(_ => 5.0) ++ (1 to 120).map(_ => 50.0))
      .map(Tuple1(_)).toDF("v")
    val cur = (1 to 100).map(_ => 100.0).map(Tuple1(_)).toDF("v")
    val out = Quality.psiDrift(ref, cur, "v", k = 4)
      .orderBy("bin").collect()
    assert(out.length == 4, s"all k bins must report: ${out.length}")
    assert(out.map(_.getLong(2)).sum == 100L,
      s"every current row must appear in some bin: ${out.toSeq}")
    assert(out.exists(r => r.getLong(1) == 0L && r.getLong(2) > 0L),
      s"a ref-empty bin holding cur mass is the drift signal: ${out.toSeq}")
    val psi = out.map(_.getDouble(5)).sum
    assert(psi > 0.25, s"total distribution swap must trip the alarm: $psi")
  }

  // ----------------------------------------------- top paths
  test("top paths count in-order type sequences per entity") {
    val es = Seq(
      (1L, ts(1), "a", 1L), (1L, ts(2), "b", 2L), (1L, ts(3), "c", 3L),
      (1L, ts(4), "b", 4L),
      (2L, ts(1), "a", 5L), (2L, ts(2), "b", 6L), (2L, ts(3), "c", 7L),
      (3L, ts(1), "x", 8L), (3L, ts(2), "y", 9L) // too short for len 3
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Series.topPaths(es, "user_id", "ts", "event_type",
        "event_id", len = 3, topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a>b>c" -> 2L, "b>c>b" -> 1L))
  }

  // ----------------------------------------------- containment pairs
  test("containment is asymmetric: quote detected, host not contained") {
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val quote = (11 to 20).map(i => s"w$i").mkString(" ") // contiguous slice
    val other = (100 to 140).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, big), (2L, quote), (2L, quote), (3L, other))
      .toDF("doc_id", "text").distinct()
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
        threshold = 0.9, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // quote's shingles are a subset of big's → containment 1.0
    assert(out((2L, 1L)) == 1.0)
    // the host document is NOT contained in the quote
    assert(!out.contains((1L, 2L)))
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    spark.catalog.clearCache()
  }

  test("containment candidates require an indexed (df-capped) shingle") {
    // the shared shingle appears in 3 docs; cap 2 excludes it → no pairs
    val t = "a b c d"
    val docs = Seq((1L, t), (2L, t), (3L, t)).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.5, shingleN = 3, maxShingleDf = 2)
    assert(out.isEmpty)
    spark.catalog.clearCache()
  }

  // ----------------------------------------------- SRM check
  test("srm chi2 matches hand computation on distinct units") {
    // one chatty unit (many rows) must count once
    val rows = (1L to 30L).map(u => (u, "seg")) ++
      Seq.fill(50)((1L, "seg"))
    val df = rows.toDF("user_id", "seg")
    val arms = df.select(col("user_id"),
        Sampling.hashBucket(col("user_id"), "ab", 2).as("arm"))
      .distinct().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val na = arms.values.count(_ == 0L).toDouble
    val nb = arms.values.count(_ == 1L).toDouble
    val out = Experiment.srmCheck(df, "user_id", "seg").collect()(0)
    assert(out.getLong(1) == na.toLong && out.getLong(2) == nb.toLong)
    assert(out.getDouble(3) ==
      graft.functions.Rounding.roundTo((na - nb) * (na - nb) / (na + nb), 4))
    assert(!out.getBoolean(4)) // a fair hash split must not alarm
  }

  // ----------------------------------------------- negative sampling
  test("negative samples are never real edges and are deterministic") {
    val edges = (for { a <- 1 to 12; b <- 1 to 12 if a < b && (a + b) % 3 == 0 }
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val neg1 = Graph.negativeSample(edges, "a", "b", buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(neg1.nonEmpty)
    val real = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(neg1.intersect(real).isEmpty, s"sampled a real edge: $neg1")
    // pure function of (nodes, salt): partitioning must not matter
    val neg2 = Graph.negativeSample(edges.repartition(7), "a", "b",
        buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(neg1 == neg2)
  }

  // ----------------------------------------------- PMI pairs
  test("pmi ranks surprising co-occurrence above popular co-occurrence") {
    // baskets: (a,b) always together in their 2 baskets (surprising);
    // (c,d) co-occur twice but each appears in 6 baskets (expected)
    val rows = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")
    ) ++ (3L to 8L).flatMap(k => Seq((k, "c"), (k, "d")))
    val out = Assoc.pmiPairs(rows.toDF("bk", "it"), "bk", "it",
        minSupport = 2L, topN = 10)
      .collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(5)).toMap
    def pmi(np: Long, na: Long, nb: Long, n: Long): Double =
      graft.functions.Rounding.roundTo(
        math.log(np.toDouble * n / (na.toDouble * nb)), 4)
    assert(byPair(("a", "b")) == pmi(2, 2, 2, 8))
    assert(byPair(("c", "d")) == pmi(6, 6, 6, 8))
    assert(byPair(("a", "b")) > byPair(("c", "d")))
  }

  // ----------------------------------------------- weekday profile
  test("weekday profile uses epoch-mod dow (2024-01-01 is Monday=0)") {
    val events = Seq(
      ("click", ts(1)), ("click", ts(1)), // Mon
      ("click", ts(2)),                   // Tue
      ("click", ts(7))                    // Sun
    ).toDF("event_type", "ts")
    val out = Series.weekdayProfile(events, "event_type", "ts")
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(4))))
      .toMap
    assert(out(0) == ((2L, 3.5)))   // Monday share 0.5 → idx 3.5
    assert(out(1) == ((1L, 1.75)))
    assert(out(6) == ((1L, 1.75)))  // Sunday is 6, never 0
  }

  // ----------------------------------------------- skip-gram PMI
  test("skip-gram pairs respect the window and document boundaries") {
    val docs = Seq(
      (1L, "a b c d"),   // window 2: ab ac bc bd cd
      (2L, "x a")        // xa — never pairs across docs with doc 1
    ).toDF("doc_id", "text")
    val out = Assoc.skipgramPmi(docs, "doc_id", "text",
        window = 2, minCount = 1L, topN = 50)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("a", "x")))
    // no (a,d): positions 0 and 3 exceed window 2
    assert(!out.contains(("a", "d")))
    spark.catalog.clearCache()
  }

  // ----------------------------------------------- vocab coverage
  test("oov rate counts tokens outside the deterministic top-K vocab") {
    // corpus: 'the' x4, 'cat' x3, 'sat' x2, rare x1 each
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat sat zzz"),
      (3L, "the the cat qqq ppp")
    ).toDF("doc_id", "text")
    val out = Quality.vocabCoverage(docs, "doc_id", "text", topK = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // vocab = {the, cat, sat}
    assert(out(1L) == ((3L, 0L, 0.0)))
    assert(out(2L) == ((4L, 1L, 0.25)))
    assert(out(3L) == ((5L, 2L, 0.4)))
  }

  // ----------------------------------------------- HLL distinct
  test("hll estimate lands within theory bounds, duplicates are free") {
    val n = 5000
    val base = (1 to n).map(i => Tuple1(s"key$i")).toDF("k")
    val e1 = Sketch.hllEstimate(base, "k", p = 8)
      .collect()(0).getDouble(4)
    // 1.04/sqrt(256) ~ 6.5% std error; 4 sigma is a safe spec bound
    assert(math.abs(e1 - n) / n < 0.26, s"estimate $e1 for $n")
    // duplicating every key must not move a single register
    val e2 = Sketch.hllEstimate(base.union(base), "k", p = 8)
      .collect()(0).getDouble(4)
    assert(e1 == e2)
  }

  test("hll small range uses linear counting and is near-exact") {
    val df = (1 to 30).map(i => Tuple1(s"v$i")).toDF("k")
    val r = Sketch.hllEstimate(df, "k", p = 8).collect()(0)
    assert(r.getLong(2) > 0)   // zeros remain
    val est = r.getDouble(4)
    assert(math.abs(est - 30.0) < 3.0, s"linear counting off: $est")
  }

  test("hll registers merge by max: split + merge equals whole") {
    val all = (1 to 2000).map(i => Tuple1(s"m$i")).toDF("k")
    val whole = Sketch.hllEstimate(all, "k", p = 8).collect()(0)
    // recompute over an arbitrary 3-way split union — same rows, so
    // identical registers regardless of partitioning
    val redistributed = Sketch.hllEstimate(all.repartition(13), "k", p = 8)
      .collect()(0)
    assert(whole.getLong(3) == redistributed.getLong(3)) // sum_scaled
    assert(whole.getDouble(4) == redistributed.getDouble(4))
  }

  test("hllRollup: max-merged group registers = registers of the union") {
    import org.apache.spark.sql.functions.{col, lit}
    // 3 "days" with overlapping keys; rolling all days up into one
    // group must equal the ungrouped estimate on the union — exactly
    val rows = (1 to 900).map(i => (s"u${i % 400}", i % 3))
    val df = rows.toDF("k", "day")
    val daily = Sketch.hllRegistersBy(df, "k", "day", p = 8)
    assert(daily.select("grp").distinct().count() == 3L)
    val rolled = Sketch.hllRollup(daily, lit(0), p = 8).collect()(0)
    val whole = Sketch.hllEstimate(df.select("k"), "k", p = 8).collect()(0)
    assert(rolled.getLong(4) == whole.getLong(3))     // sum_scaled
    assert(rolled.getDouble(5) == whole.getDouble(4)) // estimate
    // identity rollup keeps the per-day groups distinct
    assert(Sketch.hllRollup(daily, col("grp"), p = 8).count() == 3L)
  }

  // ----------------------------------------------- degenerate inputs
  test("round-5 operators survive empty and degenerate inputs") {
    val emptyEvents = Seq.empty[(Long, Timestamp, String, Long)]
      .toDF("user_id", "ts", "event_type", "event_id")
    assert(Series.retentionCohorts(emptyEvents, "user_id", "ts").isEmpty)
    assert(Series.rollingAnomalies(emptyEvents, "event_type", "ts")
      .isEmpty)
    assert(Series.topPaths(emptyEvents, "user_id", "ts", "event_type",
      "event_id").isEmpty)
    assert(Series.weekdayProfile(emptyEvents, "event_type", "ts").isEmpty)
    // single-node graph: no pairs to sample, no triangles
    val oneEdge = Seq((1L, 2L)).toDF("a", "b")
    assert(Graph.triangleCounts(oneEdge, "a", "b").isEmpty)
    spark.catalog.clearCache()
    // a constant column has identical quantile boundaries: every row
    // lands in bin 0 (ties go low) — one bin row, not a crash
    val const = Seq.fill(50)(Tuple1(7.0)).toDF("v")
    val edh = Quality.equiDepthHistogram(const, "v", k = 4).collect()
    assert(edh.length == 1 && edh(0).getInt(0) == 0 &&
      edh(0).getLong(1) == 50L)
    // snapshot diff where one side is empty: everything is added
    val empty = Seq.empty[(Long, Long)].toDF("k", "n")
    val nw = Seq((1L, 2L), (2L, 3L)).toDF("k", "n")
    val d = History.snapshotDiff(empty, nw, "k", Seq("n"))
      .collect().map(_.getString(1))
    assert(d.toSeq == Seq("added", "added"))
    // PSI with an empty current period: smoothing keeps terms finite
    val ref = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val emptyCur = Seq.empty[Tuple1[Double]].toDF("v")
    val psi = Quality.psiDrift(ref, emptyCur, "v", k = 4).collect()
    assert(psi.length == 4 &&
      psi.forall(r => !r.getDouble(5).isInfinite && !r.getDouble(5).isNaN))
  }

  test("rolling anomalies: first days have no z until minBase history") {
    val events = (1 to 4).map(d => ("view", ts(d))).toDF("event_type", "ts")
    val out = Series.rollingAnomalies(events, "event_type", "ts",
        lookback = 7, zThresh = 3.0, minBase = 3)
      .orderBy("day").collect()
    assert(out(0).getLong(3) == 0L) // n_base
    assert(out(1).getLong(3) == 1L)
    out.take(3).foreach(r => assert(r.isNullAt(6)))
  }

  test("KS drift: known statistic, smallest-value tie-break") {
    val ref = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val cur = Seq(3.0, 4.0, 5.0, 6.0).toDF("x")
    val r = Quality.ksDrift(ref, cur, "x", buckets = 2).head()
    // F diverges by 0.5 at v=2, 3 and 4 — tie breaks to the smallest
    assert(r.getAs[Long]("n_ref") == 4 && r.getAs[Long]("n_cur") == 4)
    assert(r.getAs[Double]("ks_stat") == 0.5)
    assert(r.getAs[Double]("ks_at") == 2.0)
  }

  test("KS drift: identical samples score zero; nulls are excluded") {
    val a = Seq[java.lang.Double](1.0, 2.0, 2.0, 9.0, null).toDF("x")
    val r = Quality.ksDrift(a, a, "x", buckets = 3).head()
    assert(r.getAs[Long]("n_ref") == 4) // null dropped
    assert(r.getAs[Double]("ks_stat") == 0.0)
    assert(r.getAs[Double]("ks_at") == 1.0) // all values tie at 0 → smallest
  }

  test("KS drift: bucketed prefix sum equals the single-bucket cumsum") {
    val ref = (1 to 200).map(i => (i * 37 % 101).toDouble).toDF("x")
    val cur = (1 to 150).map(i => (i * 53 % 97 + 10).toDouble).toDF("x")
    val one = Quality.ksDrift(ref, cur, "x", buckets = 1).head()
    val many = Quality.ksDrift(ref, cur, "x", buckets = 8).head()
    assert(one == many)
  }

  test("q279 boosted stumps: exact SSE argmax, zero residuals round 2") {
    // days 1-4 with step revenue: split at day 2 (score 7.8e11 beats
    // 6.6e11 at days 1/3); leaves fit exactly -> round-2 residual sums
    // are all zero -> every score ties at 0 -> smallest day wins
    def date(d: Int) = java.time.LocalDate.of(1990, 1, 1).plusDays(d)
      .toString
    val orders = Seq(
      (date(1), 1.00), (date(1), 1.00), (date(2), 1.00),
      (date(3), 5.00), (date(4), 5.00), (date(4), 5.00))
      .toDF("o_orderdate", "o_totalprice")
    val dir = staged("boost")("orders" -> orders)
    val rows = SparkEntry.queries("q279_boosted_stumps")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      (1, 2L, 3L, 3L, 100000L, 500000L),
      (2, 1L, 2L, 4L, 0L, 0L)), rows.toSeq.toString)
  }
}
