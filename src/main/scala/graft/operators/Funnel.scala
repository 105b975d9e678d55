package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for a sequence of
  * stage event types (view → click → purchase …), the earliest time
  * each entity completed each stage IN ORDER — stage k counts only if
  * it happens strictly after the entity's stage k−1 time (the
  * conversion-funnel semantics product analytics tools implement).
  *
  * Scale posture: one filtered scan per stage (the event-type
  * predicate pushes into the scan), each reduced to an entity-keyed
  * min — every intermediate is entity-cardinality, joined back
  * broadcast-style, so the events table is never shuffled, only
  * scanned `|stages|` times map-side.
  */
object Funnel {

  /** Per-entity stage times: `(<keyCol>, t_<stage1>, t_<stage2>, …,
    * stage_reached)` for every entity that completed stage 1. Times
    * are epoch MICROSECONDS (bigint) — micros is the cross-engine
    * common precision; later-stage columns are null once the funnel
    * breaks.
    */
  def stages(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, funnel: Seq[String]): DataFrame = {
    require(funnel.nonEmpty, "funnel needs at least one stage")
    require(funnel.distinct.length == funnel.length,
      "funnel stages must be distinct event types")
    val first = events.filter(col(typeCol) === funnel.head)
      .groupBy(col(keyCol).as("k"))
      .agg(min(col(tsCol)).as(s"t_${funnel.head}"))
    val staged = funnel.zip(funnel.drop(1)).foldLeft(first) {
      case (acc, (prev, cur)) =>
        val next = events.filter(col(typeCol) === cur)
          .select(col(keyCol).as("k"), col(tsCol).as("ts"))
          .join(acc.select(col("k"), col(s"t_$prev")), Seq("k"))
          .filter(col("ts") > col(s"t_$prev"))
          .groupBy("k").agg(min(col("ts")).as(s"t_$cur"))
        acc.join(next, Seq("k"), "left")
    }
    val stageReached = funnel.map(st => when(col(s"t_$st").isNotNull, 1)
      .otherwise(0)).reduce(_ + _)
    staged.select(
      Seq(col("k").as(keyCol)) ++
        funnel.map(st => unix_micros(col(s"t_$st")).as(s"t_${st}_us")) ++
        Seq(stageReached.cast("int").as("stage_reached")): _*)
  }
}
