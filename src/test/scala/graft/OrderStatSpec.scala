package graft

import graft.engine.OrderStat

/** Iterative range-narrowing order statistics vs brute-force sort. */
class OrderStatSpec extends SparkSpec {
  import spark.implicits._

  test("kthSmallest matches the sorted answer for every rank (forced rounds)") {
    val xs = Seq(5.5, -3.25, 0.0, 17.0, 4.125, -3.25, 9.75, 2.5, 2.5, 100.0)
    val df = xs.toDF("v").repartition(4)
    val sorted = xs.sorted
    (1 to xs.length).foreach { k =>
      // cutoff=1, bins=2 forces many narrowing rounds
      val got = OrderStat.kthSmallest(df, "v", k, bins = 2, cutoff = 1)
      assert(got == sorted(k - 1), s"k=$k")
    }
  }

  test("duplicate-heavy input: collapsed range still yields the exact value") {
    val xs = Seq.fill(500)(7.0) ++ Seq(1.0, 2.0, 100.0)
    val df = xs.toDF("v")
    assert(OrderStat.kthSmallest(df, "v", 3, bins = 4, cutoff = 2) == 7.0)
    assert(OrderStat.kthSmallest(df, "v", 503, bins = 4, cutoff = 2) == 100.0)
    assert(OrderStat.kthSmallest(df, "v", 1, bins = 4, cutoff = 2) == 1.0)
  }

  test("lowerMedian returns (n, (n+1)/2, value); nulls ignored") {
    val df = Seq(Some(10.0), Some(30.0), None, Some(20.0)).toDF("v")
    assert(OrderStat.lowerMedian(df, "v") == ((3L, 2L, 20.0)))
    val even = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    assert(OrderStat.lowerMedian(even, "v") == ((4L, 2L, 2.0)))
  }

  test("multiQuantiles: every (column, rank) task matches its sorted " +
      "answer in one lockstep run (forced rounds)") {
    val xs = Seq(5.5, -3.25, 0.0, 17.0, 4.125, -3.25, 9.75, 2.5, 2.5, 100.0)
    val ys = Seq(7.0, 7.0, 7.0, 1.0, 2.0, 100.0, 7.0, 7.0, -1.5, 7.0)
    val df = xs.zip(ys).toDF("x", "y").repartition(4)
    val (sx, sy) = (xs.sorted, ys.sorted)
    val allRanks = (_: Long) => (1L to xs.length.toLong).toSeq
    // cutoff=1, bins=2 forces many narrowing rounds and exercises the
    // batched finisher walk on duplicate-heavy y
    val Seq((nx, gx), (ny, gy)) = OrderStat.multiQuantiles(
      df, Seq("x" -> allRanks, "y" -> allRanks), bins = 2, cutoff = 1)
    assert(nx == xs.length.toLong && ny == ys.length.toLong)
    assert(gx == sx, s"x quantiles $gx != $sx")
    assert(gy == sy, s"y quantiles $gy != $sy")
  }

  test("multiQuantiles: per-column n resolves ranks (nulls ignored); " +
      "quantileRanks is the ceil(q*n) contract") {
    val df = Seq((Some(10.0), Some(1.0)), (Some(30.0), None),
      (None, Some(3.0)), (Some(20.0), Some(2.0))).toDF("a", "b")
    val Seq((na, qa), (nb, qb)) = OrderStat.multiQuantiles(df,
      Seq("a" -> OrderStat.quantileRanks(Seq(0.5, 1.0)),
        "b" -> OrderStat.quantileRanks(Seq(0.5, 1.0))))
    assert(na == 3L && qa == Seq(20.0, 30.0))
    assert(nb == 3L && qb == Seq(2.0, 3.0))
    assert(OrderStat.quantileRanks(Seq(0.1, 0.5, 0.9))(10L) ==
      Seq(1L, 5L, 9L))
    // tiny n: every quantile clamps to a valid rank
    assert(OrderStat.quantileRanks(Seq(0.01, 0.99))(1L) == Seq(1L, 1L))
  }

  test("out-of-range rank and empty input are rejected") {
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      OrderStat.kthSmallest(df, "v", 2)
    }
    intercept[IllegalArgumentException] {
      OrderStat.lowerMedian(Seq.empty[Double].toDF("v"), "v")
    }
  }
}
