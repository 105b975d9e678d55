package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: apportion q92's wall clock between the edge build and
  * the pagerank loop at sf0.1 vs the synthesized sf1. */
object ProfileQ92 {
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    for (d <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1_v3")) {
      println(s"=== $d")
      spark.catalog.clearCache()
      val pairs = graft.Tables.orders(spark, d)
        .join(graft.Tables.lineitem(spark, d),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("cn"),
          (col("l_suppkey").cast("long") * 2 + 1).as("sn"))
        .distinct()
      val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
        .unionByName(pairs.select(col("sn").as("src"), col("cn").as("dst")))
      t("edge build (noop)") {
        edges.write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      val ranks = t("pagerank full") {
        val r = graft.operators.Graph.pagerank(edges, 0.85, 2)
        r.write.format("noop").mode("overwrite").save()
        r
      }
    }
    spark.stop()
  }
}
