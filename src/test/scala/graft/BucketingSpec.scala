package graft

import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: tables written bucketed on the join
  * key join WITHOUT a shuffle exchange. At 100 TB this is the
  * difference between re-shuffling the fact table per query and
  * shuffling once at ingest (SURVEY.md §2.3 scale notes; the engine's
  * operators pick broadcast for small dims and rely on
  * bucketing/pre-partitioning for repeated big-big joins).
  */
class BucketingSpec extends SparkSpec {

  test("joining two tables bucketed on the key plans with no Exchange") {
    val sf = "/root/testdata/sf0.001"
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_by_cust")
    Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("cust_by_cust")

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // force a sort-merge plan so the exchange (or its absence) is
      // what's under test, not a broadcast shortcut
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_by_cust")
        .join(spark.table("cust_by_cust"), Seq("o_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the only exchange allowed is the one for the final groupBy;
      // the join itself must consume the bucketed layout directly
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n$joinSection")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS orders_by_cust")
      spark.sql("DROP TABLE IF EXISTS cust_by_cust")
    }
  }
}
