package graft

import graft.engine.Stump

/** Coverage for exact decision-stump split search. */
class StumpSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly separable feature: best split has gini 0 at the boundary") {
    val df = Seq((1.0, 0L), (2.0, 0L), (3.0, 0L), (10.0, 1L), (11.0, 1L))
      .toDF("x", "y")
    val best = Stump.bestSplits(df, "x", "y", buckets = 2, topK = 1).head()
    assert(best.getDouble(0) == 3.0) // threshold: x <= 3 left
    assert(best.getLong(1) == 3L && best.getLong(2) == 0L) // n_left, pos_left
    assert(best.getLong(3) == 2L && best.getLong(4) == 2L) // n_right, pos_right
    assert(best.getDouble(5) == 0.0)
  }

  test("hand-computed gini on a 4-point mix") {
    // x=1 y=1 | x=2 y=0 | x=3 y=1 | x=4 y=1 ; split at x<=2:
    // L: n=2 p=1 → n_L·G_L = 2−(1+1)/2 = 1 ; R: n=2 p=2 → 0 ; g = 1/4
    val df = Seq((1.0, 1L), (2.0, 0L), (3.0, 1L), (4.0, 1L)).toDF("x", "y")
    val rows = Stump.bestSplits(df, "x", "y", buckets = 1, topK = 3)
      .collect().map(r => r.getDouble(0) -> r.getDouble(5)).toMap
    assert(rows(2.0) == 0.25)
    // split at x<=1: L pure (1 pos), R: n=3 p=2 → 3−(4+1)/3 = 4/3 → /4
    assert(rows(1.0) == graft.functions.Rounding.roundTo(4.0 / 3.0 / 4.0, 6))
  }

  test("results are invariant to the bucket count (two-level = global)") {
    val df = (1 to 200).map(i => (i.toDouble % 37, (i % 3 == 0).compareTo(false).toLong))
      .toDF("x", "y")
    val a = Stump.bestSplits(df, "x", "y", buckets = 1, topK = 10).collect()
    val b = Stump.bestSplits(df, "x", "y", buckets = 8, topK = 10).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("featureRanking agrees with per-feature bestSplits; perfect feature wins") {
    // x1 perfectly separates y; x2 is noise
    val df = Seq(
      (1.0, 9.0, 0L), (2.0, 1.0, 0L), (3.0, 8.0, 0L),
      (10.0, 2.0, 1L), (11.0, 7.0, 1L)
    ).toDF("x1", "x2", "y")
    val ranked = Stump.featureRanking(df, Seq("x1", "x2"), "y", buckets = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(6)))).toMap
    assert(ranked("x1") == ((3.0, 0.0))) // clean split at x1 <= 3
    assert(ranked("x2")._2 > 0.0)
    // consistency with the single-feature kernel
    val single = Stump.bestSplits(df, "x2", "y", buckets = 2, topK = 1)
      .head()
    assert(ranked("x2") == ((single.getDouble(0), single.getDouble(5))))
  }

  test("the all-left non-split is excluded and nulls are ignored") {
    val df = Seq((Some(1.0), Some(0L)), (Some(2.0), Some(1L)),
      (None, Some(1L)), (Some(3.0), None)).toDF("x", "y")
    val rows = Stump.bestSplits(df, "x", "y", buckets = 1, topK = 10).collect()
    // only values 1.0 and 2.0 survive; threshold 2.0 would be all-left
    assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0))
  }
}
