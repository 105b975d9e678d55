package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe (never shipped): where do q272's warm seconds go?
  * Attaches a StreamingQueryListener and prints each micro-batch's
  * duration breakdown (addBatch / getBatch / commitOffsets /
  * walCommit / stateUpdate), then the wall total, for two warm runs.
  */
object ProbeSoj {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"PROBE started ${e.id}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"PROBE terminated")
    }
    spark.streams.addListener(listener)

    (1 to 3).foreach { run =>
      val t0 = System.nanoTime()
      graft.queries.Signals.outerJoinReplay(spark, d, 2)
        .write.format("noop").mode("overwrite").save()
      println(f"PROBE q272 run$run total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
