package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on a user's timeline (microsecond event time). */
final case class SessionEvent(user_id: Long, ts_us: Long)

/** Running per-user session statistics emitted after each batch. */
final case class SessionTally(user_id: Long, n_sessions: Long,
                              n_events: Long)

private[streaming] final case class SessionState(nSessions: Long,
                                                 nEvents: Long,
                                                 lastTsUs: Long)

/** Event-time processing shared between the batch surface and
  * Structured Streaming (SURVEY.md §2.10). The same transform runs in
  * both modes: `Relational.q22` applies it to the batch events table,
  * and the streaming spec drives it through a MemoryStream with a
  * watermark — Spark's unified Dataset API is what makes the reference's
  * hand-rolled "re-read a batch each round" loop
  * (`/root/reference/kernel.cu:190-195`) expressible as a real stream.
  */
object EventPipeline {

  /** Tumbling-window counts/sums per event type. On a stream this
    * becomes a stateful windowed aggregation; with `withWatermark`
    * upstream, state is bounded and late data beyond the watermark is
    * dropped.
    */
  def windowedAgg(events: DataFrame, windowLength: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength).getField("start")
        .as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           graft.functions.Rounding.roundTo(sum("value"), 3).as("sum_value"))

  /** Stateful streaming sessionization via `flatMapGroupsWithState`
    * (SURVEY.md §2.10): per-user session counting with an inactivity
    * gap, state = (sessions so far, events so far, last event time).
    * The batch twin is `Relational.q23` (lag window). State is O(1)
    * per key but retained for EVERY key seen (NoTimeout): right for
    * bounded key domains (users of a product); an unbounded key stream
    * needs GroupStateTimeout.EventTimeTimeout plus a watermark and
    * hasTimedOut-driven eviction — a watermark alone does NOT clear
    * flatMapGroupsWithState state. Events within a batch are sorted by
    * event time before folding; a cross-batch late event older than the
    * carried high-water mark cannot regress it (it may still be counted
    * in the wrong session — exact late-data semantics need the
    * event-time-timeout variant).
    */
  def sessionTallies(events: Dataset[SessionEvent],
                     gapUs: Long): Dataset[SessionTally] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          val sorted = it.toArray.sortBy(_.ts_us)
          var st = state.getOption
            .getOrElse(SessionState(0L, 0L, Long.MinValue))
          sorted.foreach { e =>
            val newSession =
              st.lastTsUs == Long.MinValue || e.ts_us - st.lastTsUs > gapUs
            st = SessionState(st.nSessions + (if (newSession) 1L else 0L),
              st.nEvents + 1L, math.max(st.lastTsUs, e.ts_us))
          }
          state.update(st)
          Iterator.single(SessionTally(user, st.nSessions, st.nEvents))
      }
  }
}
