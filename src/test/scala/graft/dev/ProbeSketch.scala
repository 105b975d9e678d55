package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (never shipped): where do q382/q383's warm seconds go?
  * Times the component stages separately at sf0.1 — scan+md5 hash,
  * the bounded top-k payload aggregator, the checkpoint, and the full
  * query — on a warm JVM. */
object ProbeSketch {
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
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    spark.read.parquet(s"$d/lineitem.parquet").groupBy("l_returnflag")
      .count().write.format("noop").mode("overwrite").save()

    val li = graft.Tables.lineitem(spark, d)
    def hashed = li.select(
      concat(col("l_returnflag"), col("l_linestatus")).as("gkey"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("vc"),
      graft.functions.TextFunctions.token60(concat(lit("qsk"),
        col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string"), lit("_"),
        col("l_partkey").cast("string"), lit("_"),
        col("l_suppkey").cast("string"))).as("h"))

    (1 to 2).foreach { r =>
      t(s"run$r scan_only") {
        li.select("l_returnflag", "l_extendedprice")
          .write.format("noop").mode("overwrite").save()
      }
      t(s"run$r scan_md5") {
        hashed.write.format("noop").mode("overwrite").save()
      }
      t(s"run$r hashagg_count") {
        hashed.groupBy("gkey").agg(count(lit(1)).as("n"), max("h"))
          .write.format("noop").mode("overwrite").save()
      }
      t(s"run$r md5_only_nogroup") {
        li.select(graft.functions.TextFunctions.token60(concat(lit("qsk"),
          col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string"), lit("_"),
          col("l_partkey").cast("string"), lit("_"),
          col("l_suppkey").cast("string"))).as("h"))
          .write.format("noop").mode("overwrite").save()
      }
      t(s"run$r agg_topk") {
        graft.operators.TopK.topKPerGroupWithPayload(
          hashed.select(col("gkey"), col("h").as("hid"),
            (-col("h")).cast("double").as("negh"), col("vc")),
          "gkey", "hid", "negh", "vc", 64,
          extraAggs = Seq(count(lit(1)).as("n_exact_g")))
          .write.format("noop").mode("overwrite").save()
      }
      t(s"run$r full_q382") {
        graft.SparkEntry.queries("q382_quantile_sketch_rollup")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
