package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding.{roundTo => round}

/** Classifier/ranker evaluation kernels.
  *
  * Reference scope: the reference engine (kernel.cu) trains fitted
  * models but never grades them; these are the evaluation counterparts
  * a curation pipeline needs before trusting a quality classifier's
  * scores as filter thresholds (SURVEY §2.11).
  *
  * Determinism contract: inputs are INTEGER score units (the caller
  * quantizes), every rank statistic is an exact integer count, and the
  * only floating-point op is the final division — so results are
  * independent of partitioning, join order, and engine.
  */
object MlEval {

  /** Exact ROC AUC (Mann-Whitney U with the standard tie correction)
    * of an integer score against a boolean label:
    *
    *   AUC = [Σ_s pos(s) · (2·negBelow(s) + neg(s))] / (2·P·N)
    *
    * over distinct score values `s` — pairs are NEVER enumerated
    * (corpus² would be), and there is no global row sort: per-value
    * counts feed q158's two-level bucketed prefix sum (per-bucket
    * windows + a `buckets`-row offset prefix), so the widest shuffle
    * is the distinct-score table and the only single-partition state
    * is `buckets` rows. The numerator accumulates in DECIMAL(38,0):
    * P·N overflows LONG already at ~4.3e9 rows; the
    * `n·S_t`-style cross-products here reach P·N·2.
    *
    * `scoreUnits` must be an integral column (quantize doubles to
    * micro-units first — exactness of the grade depends on it);
    * `posCol` boolean. Returns one row `(n_pos, n_neg, auc)` with
    * `auc` rounded to 9 dp; NULL auc when either class is empty.
    */
  def aucExact(df: DataFrame, scoreUnitsCol: String, posCol: String,
               buckets: Int = 32): DataFrame =
    aucImpl(df.withColumn("__g", lit(0)), "__g", scoreUnitsCol, posCol,
        buckets)
      .drop("__g")

  /** Per-GROUP exact AUC — the same rank algebra partitioned by a
    * segment column: the fairness / robustness readout ("does the
    * detector rank equally well on every source / language / fold?")
    * that a single pooled AUC hides. Each group's prefix sums run
    * inside its own (group, bucket) windows; the single-partition
    * offset table holds groups×buckets rows and the per-group offset
    * prefix windows partition BY GROUP, so no corpus-sized
    * single-partition state appears for any group count. Returns one
    * row per group `(byCol, n_pos, n_neg, auc)`.
    */
  def aucExactBy(df: DataFrame, byCol: String, scoreUnitsCol: String,
                 posCol: String, buckets: Int = 32): DataFrame =
    aucImpl(df, byCol, scoreUnitsCol, posCol, buckets)

  private def aucImpl(df: DataFrame, byCol: String, scoreUnitsCol: String,
                      posCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, "need at least one range bucket")
    val vals = df
      .select(col(byCol).as("g"),
        col(scoreUnitsCol).cast("long").as("u"), col(posCol).as("y"))
      .groupBy("g", "u")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("p"),
           sum(when(col("y"), 0L).otherwise(1L)).as("n"))
    // range buckets exist only for parallelism — ANY monotone bucketing
    // yields the same prefix sums; GLOBAL quantiles keep them balanced
    // and shared across groups (per-group boundaries would be another
    // aggregation for zero correctness gain)
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val boundsDf =
      if (buckets == 1) vals.agg(array().cast("array<double>").as("bounds"))
      else vals.agg(expr(
        // approximate on purpose: bounds are parallelism-only (any
        // monotone bucketing yields the same exact prefix sums), and
        // exact percentile() buffers the whole distinct-(g,u) multiset
        // in ONE task — corpus-sized state for near-unique score cols
        s"cast(approx_percentile(u, array(${fracs.mkString(",")}), 1000)" +
          " as array<double>)").as("bounds"))
    val bucketed = vals.crossJoin(broadcast(boundsDf))
      .select(col("g"), col("u"), col("p"), col("n"),
        aggregate(col("bounds"), lit(0),
          (acc, b) => acc + when(col("u").cast("double") > b, 1)
            .otherwise(0)).as("bk"))
    val inBucket = Window.partitionBy("g", "bk").orderBy("u")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = bucketed
      .withColumn("lcn", sum("n").over(inBucket))
    // exclusive bucket-offset prefix: groups × buckets rows, windowed
    // per group
    val offW = Window.partitionBy("g").orderBy("bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("g", "bk")
      .agg(sum(col("n")).as("tn"))
      .withColumn("onb", coalesce(sum("tn").over(offW), lit(0L)))
      .select("g", "bk", "onb")
    val dec = "decimal(38,0)"
    val terms = withLocal.join(offsets, Seq("g", "bk"))
      // exclusive negatives strictly below u + the tie block at u
      .withColumn("nb", col("lcn") - col("n") + col("onb"))
      .select(col("g"), col("p"), col("n"),
        (col("p").cast(dec) *
          (lit(2L) * col("nb") + col("n")).cast(dec)).as("t2"))
    terms
      .groupBy("g")
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
           sum(col("t2")).as("num2"))
      .select(col("g").as(byCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("num2").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") *
             col("n_neg").cast("double")), 9)).as("auc"))
  }

  /** Per-group exact Mann–Whitney rank-sum TEST — the hypothesis-test
    * readout of the same rank algebra [[aucExact]] uses as a grade:
    * U_A (midrank convention), its null mean n_A·n_B/2, and the
    * tie-corrected normal approximation
    *
    *   Var = n_A·n_B/12 · [(N+1) − Σ(t³−t)/(N·(N−1))]
    *
    * where t runs over tie-block sizes. The nonparametric companion to
    * Welch's t ([[Experiment.welchAb]]): it sees median/stochastic-
    * dominance shifts that a heavy tail hides from the mean test.
    * Same distribution shape as [[aucExact]]: per-value counts, the
    * q158 two-level bucketed prefix sum, no pair enumeration, no
    * global sort; U accumulates in DECIMAL(38,0) (2·U reaches
    * 2·n_A·n_B), the tie sum Σt³ in DECIMAL (N³). Returns one row per
    * group `(byCol, n_a, n_b, u_a, z)`: `u_a` exact to the half-unit
    * (midranks make U half-integral — exact in DOUBLE far past any
    * corpus size we grade), `z` 4 dp, NULL when an arm is empty or
    * the variance degenerates (all values tied).
    */
  def mannWhitney(df: DataFrame, byCol: String, scoreUnitsCol: String,
                  aCol: String, buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "need at least one range bucket")
    val vals = df
      .select(col(byCol).as("g"),
        col(scoreUnitsCol).cast("long").as("u"), col(aCol).as("y"))
      .groupBy("g", "u")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("a"),
           sum(when(!col("y"), 1L).otherwise(0L)).as("b"))
    val fracs = (1 until buckets).map(_.toDouble / buckets)
    val boundsDf =
      if (buckets == 1) vals.agg(array().cast("array<double>").as("bounds"))
      else vals.agg(expr(
        // approximate on purpose: bounds are parallelism-only (any
        // monotone bucketing yields the same exact prefix sums), and
        // exact percentile() buffers the whole distinct-(g,u) multiset
        // in ONE task — corpus-sized state for near-unique score cols
        s"cast(approx_percentile(u, array(${fracs.mkString(",")}), 1000)" +
          " as array<double>)").as("bounds"))
    val bucketed = vals.crossJoin(broadcast(boundsDf))
      .select(col("g"), col("u"), col("a"), col("b"),
        aggregate(col("bounds"), lit(0),
          (acc, bnd) => acc + when(col("u").cast("double") > bnd, 1)
            .otherwise(0)).as("bk"))
    val inBucket = Window.partitionBy("g", "bk").orderBy("u")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = bucketed.withColumn("lcb", sum("b").over(inBucket))
    val offW = Window.partitionBy("g").orderBy("bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("g", "bk")
      .agg(sum(col("b")).as("tb"))
      .withColumn("ob", coalesce(sum("tb").over(offW), lit(0L)))
      .select("g", "bk", "ob")
    val dec = "decimal(38,0)"
    val t = (col("a") + col("b")).cast(dec)
    val terms = withLocal.join(offsets, Seq("g", "bk"))
      .withColumn("bBelow", col("lcb") - col("b") + col("ob"))
      .select(col("g"), col("a"), col("b"),
        (col("a").cast(dec) *
          (lit(2L) * col("bBelow") + col("b")).cast(dec)).as("u2"),
        (t * t * t - t).as("tie3"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val nn = na + nb
    val variance = na * nb / lit(12.0) *
      ((nn + lit(1.0)) - col("ties").cast("double") / (nn * (nn - lit(1.0))))
    terms
      .groupBy("g")
      .agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"),
        sum(col("u2")).as("u2"), sum(col("tie3")).as("ties"))
      .select(col("g").as(byCol), col("n_a"), col("n_b"),
        (col("u2").cast("double") / lit(2.0)).as("u_a"),
        when(col("n_a") > 0 && col("n_b") > 0 && variance > 0.0,
          round((col("u2").cast("double") / lit(2.0) - na * nb / lit(2.0)) /
            sqrt(variance), 4)).as("z"))
  }
}
