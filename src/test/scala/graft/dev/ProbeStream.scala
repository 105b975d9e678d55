package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe (never shipped): run registry queries by name with a
  * StreamingQueryListener attached, printing each micro-batch's
  * duration breakdown and per-run wall totals.
  * Usage: Test/runMain graft.dev.ProbeStream <query> [runs]
  */
object ProbeStream {
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
    val name = args.head
    val runs = if (args.length > 1) args(1).toInt else 3

    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    (1 to runs).foreach { run =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"PROBE $name run$run total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
