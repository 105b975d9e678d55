package graft

import org.apache.spark.sql.functions._

import graft.engine.Logistic

/** Coverage for the distributed logistic-regression GD trainer. */
class LogisticSpec extends SparkSpec {
  import spark.implicits._

  private def separable = Seq(
    (-3.0, 0.0), (-2.5, 0.0), (-2.0, 0.0), (-1.5, 0.0), (-1.0, 0.0),
    (1.0, 1.0), (1.5, 1.0), (2.0, 1.0), (2.5, 1.0), (3.0, 1.0)
  ).toDF("x", "y")

  test("separable 1-D data: slope turns positive and classifies all rows") {
    val w = Logistic.fitGd(separable, Seq("x"), "y", lr = 0.5, rounds = 20)
    assert(w(1) > 0.0)
    val z = Logistic.margin(w, Seq(col("x")))
    val correct = separable
      .filter((z > lit(0.0)) === (col("y") === lit(1.0))).count()
    assert(correct == 10L)
  }

  test("weights are exactly invariant under repartitioning (quantized sums)") {
    val base = separable.repartition(1)
    val shuffled = separable.repartition(7)
    val a = Logistic.fitGd(base, Seq("x"), "y", rounds = 5)
    val b = Logistic.fitGd(shuffled, Seq("x"), "y", rounds = 5)
    assert(a.toSeq == b.toSeq) // bit-identical, not approximately equal
  }

  test("rounds = 0 returns the zero model; each GD round lowers log-loss") {
    val w0 = Logistic.fitGd(separable, Seq("x"), "y", rounds = 0)
    assert(w0.toSeq == Seq(0.0, 0.0))
    def loss(w: Array[Double]): Double = {
      val z = Logistic.margin(w, Seq(col("x")))
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      separable.agg(avg(-(col("y") * log(p) +
        (lit(1.0) - col("y")) * log(lit(1.0) - p)))).head().getDouble(0)
    }
    val losses = (0 to 4).map(r =>
      loss(Logistic.fitGd(separable, Seq("x"), "y", rounds = r)))
    losses.sliding(2).foreach { case Seq(prev, next) => assert(next < prev) }
  }

  test("non-power-of-two lr is rejected (exactness precondition)") {
    intercept[IllegalArgumentException] {
      Logistic.fitGd(separable, Seq("x"), "y", lr = 0.3)
    }
  }

  test("two-feature margin uses left-fold association (oracle contract)") {
    val w = Array(0.5, 2.0, -1.0)
    val df = Seq((3.0, 7.0)).toDF("a", "b")
    val got = df.select(Logistic.margin(w, Seq(col("a"), col("b"))))
      .head().getDouble(0)
    assert(got == ((0.5 + 2.0 * 3.0) + -1.0 * 7.0))
  }
}
