package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — turning an irregular event stream into
  * the dense, gap-filled grid every downstream window/forecast/feature
  * job assumes: one row per (entity, day) across the observed span,
  * zero-filled counts, and the last active day carried forward.
  */
object Series {

  /** Dense daily activity grid per entity: `(<keyCol>, day, n_events,
    * last_active, days_since)` for EVERY day in the observed global
    * span — missing days appear with `n_events = 0`, `last_active` is
    * the most recent day with activity at or before `day` (null until
    * the entity's first event), and `days_since = day − last_active`.
    *
    * Scale posture: the grid is |entities| × |span days| — the
    * operator's contract, not an accident (the dense form is the point;
    * span is bounded by the data's own time range). The daily counts
    * are one hash aggregation of the events; the grid build is a
    * cross join of the entity list against one exploded date array (a
    * span-sized literal produced from a one-row aggregate); the
    * forward fill is a running `max` window per entity — `max` over a
    * monotone date column equals last-non-null carry-forward, without
    * leaning on cross-engine IGNORE NULLS frames.
    */
  /** First-order Markov transition statistics over per-entity ordered
    * event streams — the "what happens after X" table behind
    * next-event prediction features and behavioral anomaly scores:
    * `(<typeCol>, next_type, n, prob)` where `prob` is the MLE
    * conditional `P(next | current)` (4 decimals, shared rounding
    * kernel). Transitions cross only consecutive events of the SAME
    * entity; each entity's last event emits none.
    *
    * Scale posture: one shuffle+sort on the entity key (the per-entity
    * order is the semantics), a codegen'd `lead` window, then a
    * transition-type aggregation whose cardinality is |types|² — the
    * corpus collapses map-side.
    */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val pairs = events
      .withColumn("next_type", lead(col(typeCol), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col(typeCol), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val w2 = Window.partitionBy(typeCol)
    pairs.withColumn("prob",
      graft.functions.Rounding.roundTo(
        col("n").cast("double") / sum(col("n")).over(w2).cast("double"), 4))
  }

  def dailyGapFill(events: DataFrame, keyCol: String,
                   tsCol: String): DataFrame = {
    val daily = events
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("cnt"))
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val days = span.select(
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = daily.select(col("k")).distinct().crossJoin(days)
    val w = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("k", "day"), "left")
      .withColumn("n_events", coalesce(col("cnt"), lit(0L)))
      .withColumn("last_active",
        max(when(col("cnt").isNotNull, col("day"))).over(w))
      .select(col("k").as(keyCol), col("day"), col("n_events"),
        col("last_active"),
        datediff(col("day"), col("last_active")).as("days_since"))
  }
}
