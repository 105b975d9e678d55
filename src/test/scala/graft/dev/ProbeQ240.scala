package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (never shipped): where do q240's cache-cold seconds go?
  * Times each stage of the pipeline separately at sf0.1. */
object ProbeQ240 {
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
    // warm the JVM
    spark.read.parquet(s"$d/lineitem.parquet").groupBy("l_returnflag")
      .count().write.format("noop").mode("overwrite").save()

    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val split = lit("1998-01-01").cast("date")
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    def melted() = li
      .select(explode(array(
          struct(lit("l_quantity").as("f"),
            col("l_quantity").cast("double").as("v")),
          struct(lit("l_extendedprice").as("f"),
            col("l_extendedprice").cast("double").as("v")),
          struct(lit("l_discount").as("f"),
            col("l_discount").cast("double").as("v")),
          struct(lit("l_tax").as("f"),
            col("l_tax").cast("double").as("v")))).as("e"),
        (to_date(col("l_shipdate")) < split).as("isref"))
      .select(col("e.f").as("f"), col("e.v").as("v"), col("isref"))
      .filter(col("v").isNotNull)

    (1 to 3).foreach { r =>
      spark.catalog.clearCache()
      t(s"round$r melt-only noop") {
        melted().write.format("noop").mode("overwrite").save()
      }
      t(s"round$r grouped counts") {
        melted().filter(col("isref")).groupBy("f", "v")
          .agg(count(lit(1))).write.format("noop").mode("overwrite").save()
      }
      t(s"round$r boundaries") {
        graft.operators.Quality.groupedRankQuantiles(
          melted().filter(col("isref")), "f", "v",
          (1 until 8).map(i => (i, 8)))
          .write.format("noop").mode("overwrite").save()
      }
      t(s"round$r full q240") {
        graft.SparkEntry.queries("q240_feature_drift")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
