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
