package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
// cross-engine deterministic rounding shadows functions.round
import graft.functions.Rounding.{roundTo => round}

/** A/B experiment readout: deterministic two-arm assignment + Welch
  * z-test per segment, in one corpus pass.
  *
  * Assignment reuses the engine's pure-hash split ([[Sampling
  * .hashBucket]] on the experiment UNIT — e.g. the user, never the
  * event, so one unit's rows always land in one arm): reproducible on
  * any engine/partitioning, and mirrorable in the oracle. The test is
  * Welch's unequal-variance z on the arm means,
  * `z = (m_A − m_B) / √(v_A/n_A + v_B/n_B)` — the two-sample readout
  * that doesn't assume equal arm variances.
  *
  * Scale posture: arm assignment is one md5 in the scan projection;
  * ALL moments (n, Σx, Σx² per arm per segment) come from one
  * conditional hash aggregation — map-side combined, segment-count
  * output rows, no second scan, no window, no shuffle beyond the one
  * aggregation. Variances use the explicit `n/(n−1)·(E[x²]−E[x]²)`
  * form (no streaming-update order dependence).
  */
object Experiment {

  /** Per-segment Welch readout: `(<byCol>, n_a, n_b, mean_a, mean_b,
    * diff, se, z)`. Rows with a null value are excluded (they carry no
    * outcome); segments need ≥ 2 observations per arm for a sample
    * variance, others are dropped. `z` is null when both arms are
    * degenerate (zero spread).
    */
  def welchAb(df: DataFrame, unitCol: String, valCol: String,
              byCol: String, salt: String = "ab"): DataFrame = {
    val x = col(valCol).cast("double")
    val arm = Sampling.hashBucket(col(unitCol), salt, 2)
    val a = arm === 0
    val moments = df
      .filter(x.isNotNull)
      .groupBy(col(byCol))
      .agg(
        sum(when(a, 1L).otherwise(0L)).as("n_a"),
        sum(when(!a, 1L).otherwise(0L)).as("n_b"),
        sum(when(a, x).otherwise(0.0)).as("sa"),
        sum(when(!a, x).otherwise(0.0)).as("sb"),
        sum(when(a, x * x).otherwise(0.0)).as("saa"),
        sum(when(!a, x * x).otherwise(0.0)).as("sbb"))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val ma = col("sa") / na
    val mb = col("sb") / nb
    val va = greatest((col("saa") / na - ma * ma) * na / (na - 1.0),
      lit(0.0))
    val vb = greatest((col("sbb") / nb - mb * mb) * nb / (nb - 1.0),
      lit(0.0))
    val se2 = va / na + vb / nb
    moments.select(col(byCol), col("n_a"), col("n_b"),
      round(ma, 4).as("mean_a"), round(mb, 4).as("mean_b"),
      round(ma - mb, 4).as("diff"),
      round(sqrt(se2), 6).as("se"),
      when(se2 > 0.0, round((ma - mb) / sqrt(se2), 4)).as("z"))
  }

  /** Sample-ratio-mismatch check — the guardrail read BEFORE any
    * [[welchAb]] result is trusted: if the two arms' UNIT counts differ
    * more than chance allows under the intended 50/50 split, the
    * assignment or logging pipeline is broken and every downstream
    * metric is biased. Per segment: `(<byCol>, n_a, n_b, chi2,
    * srm_suspect)` with the 1-dof equal-split statistic
    * `χ² = (n_a − n_b)²/(n_a + n_b)` flagged above 6.635 (p < 0.01 —
    * the conventional SRM alarm level; an experimenter inspects, not
    * auto-drops, at this threshold).
    *
    * Counts are DISTINCT units (a chatty unit must not weigh more):
    * the corpus collapses to distinct (segment, unit) in one
    * aggregation, and everything after is segment-cardinality.
    */
  def srmCheck(df: DataFrame, unitCol: String, byCol: String,
               salt: String = "ab",
               chi2Alarm: Double = 6.635): DataFrame = {
    val units = df.select(col(byCol), col(unitCol).as("u")).distinct()
    val arm = Sampling.hashBucket(col("u"), salt, 2)
    val counts = units
      .groupBy(col(byCol))
      .agg(sum(when(arm === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(arm === 1, 1L).otherwise(0L)).as("n_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val chi2 = (na - nb) * (na - nb) / (na + nb)
    counts.select(col(byCol), col("n_a"), col("n_b"),
      round(chi2, 4).as("chi2"),
      (round(chi2, 4) > chi2Alarm).as("srm_suspect"))
  }
}
