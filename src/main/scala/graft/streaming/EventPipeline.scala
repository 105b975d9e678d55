package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
