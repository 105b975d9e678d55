package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) change tracking: turn a
  * point-in-time observation stream `(key, attribute, ts)` into a
  * validity-interval history — one row per ATTRIBUTE CHANGE with
  * `valid_from` / `valid_to` (exclusive, null while current) — the
  * merge step every warehouse dimension load runs.
  *
  * Scale posture: one shuffle+sort on the entity key (inherent — the
  * semantics are an ordered scan per entity), then two window passes
  * over the same sort order (lag to detect changes, lead to close
  * intervals); nothing corpus-wide is re-sorted and no self-join
  * materializes the observation stream twice.
  */
object History {

  /** Collapse consecutive duplicate attribute observations per key
    * into validity intervals: `(<keyCol>, <attrCol>, valid_from,
    * valid_to, is_current)` ordered within key by (`tsCol`,
    * `tieCols`…). `tieCols` must make the per-key order total —
    * equal-timestamp observations would otherwise make the collapse
    * nondeterministic.
    */
  def changeHistory(df: DataFrame, keyCol: String, attrCol: String,
                    tsCol: String, tieCols: Seq[String]): DataFrame = {
    require(tieCols.nonEmpty,
      "pass at least one tie-break column: equal-timestamp observations " +
        "make the change sequence nondeterministic without a total order")
    val order: Seq[Column] = col(tsCol).asc +: tieCols.map(col(_).asc)
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    val changes = df
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      // first observation, or value differs from the previous one —
      // null-safe, so a null attribute is a value like any other and
      // consecutive nulls collapse into one interval
      .filter(col("_rn") === 1 || !(col(attrCol) <=> col("_prev")))
      .select(Seq(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from")) ++ tieCols.map(col): _*)
    val w2 = Window.partitionBy(keyCol)
      .orderBy(col("valid_from").asc +: tieCols.map(col(_).asc): _*)
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tieCols: _*)
  }

  /** Keyed snapshot diff — the CDC/reconciliation primitive: compare
    * two versions of a keyed table and report, per key, whether it was
    * `added` (new only), `removed` (old only), `changed` (present in
    * both, any tracked column differs), or `unchanged`, plus the
    * comma-joined sorted list of changed column names. Both inputs
    * must be key-unique (one row per key — pre-aggregate if not).
    *
    * Comparison is null-safe (`<=>`): null→value, value→null, and
    * value→value′ all count as changes; null→null does not.
    *
    * Scale posture: ONE full outer join on the key — the minimal
    * possible data movement for a diff (both sides shuffle once on the
    * key; with both snapshots bucketed on the key it is shuffle-free) —
    * and a map-only status projection. Nothing is collected, no
    * windows.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   valCols: Seq[String]): DataFrame = {
    require(valCols.nonEmpty, "diff needs at least one tracked column")
    val o = oldDf.select(col(keyCol).as("k") +:
      valCols.map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select(col(keyCol).as("k") +:
      valCols.map(c => col(c).as(s"n_$c")): _*)
    // key presence must be judged by marker columns, not the value
    // columns (a legitimately all-null row would read as absent)
    val joined = o.withColumn("_in_old", lit(true))
      .join(n.withColumn("_in_new", lit(true)), Seq("k"), "full_outer")
    val changedCols = concat_ws(",", valCols.sorted.map(c =>
      when(!(col(s"o_$c") <=> col(s"n_$c")), lit(c))): _*)
    joined.select(
      col("k").as(keyCol),
      when(col("_in_old").isNull, "added")
        .when(col("_in_new").isNull, "removed")
        .when(changedCols =!= "", "changed")
        .otherwise("unchanged").as("status"),
      when(col("_in_old").isNotNull && col("_in_new").isNotNull,
        changedCols).as("changed_cols"))
  }
}
