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

  test("ANN corpus bucketed by LSH key joins with no Exchange on the corpus side") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import graft.functions.VectorFunctions

    // substantiates Similarity.knnLsh's scale note: pre-bucketing the
    // corpus by its LSH key makes repeated query batches shuffle-free
    // on the corpus side — only the (small) probe side ever moves
    val planes = VectorFunctions.randomPlanes(6, 64)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.lshBucket(col("embedding"), planes).as("bucket"))
    emb.write.mode("overwrite")
      .bucketBy(8, "bucket").sortBy("bucket")
      .saveAsTable("corpus_by_bucket")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("bucket"))
      val cand = spark.table("corpus_by_bucket")
        .join(probes, Seq("bucket"))
        .filter(col("query_id") =!= col("vec_id"))
      val plan = cand.queryExecution.executedPlan
      val smj = plan.collectFirst { case j: SortMergeJoinExec => j }.get
      def corpusScan(p: SparkPlan): Boolean = p.collectFirst {
        case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
      }.isDefined
      val corpusSide = Seq(smj.left, smj.right).find(corpusScan).get
      assert(corpusSide.collectFirst {
        case e: ShuffleExchangeExec => e
      }.isEmpty, s"bucketed corpus still shuffles:\n$corpusSide")
      assert(cand.count() > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS corpus_by_bucket")
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // AQE's runtime bloom filter: a selective filter on the dimension
    // side injects bloom_filter_might_contain onto the fact scan, so
    // at 100 TB the fact shuffle carries only rows that can possibly
    // join — a runtime semi-join reduction with no manual step
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "1000MB")
      // test tables are KB-sized; at production scale the default 10GB
      // application-side threshold gates injection instead
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val sf = "/root/testdata/sf0.001"
      val fact = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      assert(joined.queryExecution.optimizedPlan.toString
        .contains("might_contain"),
        "no runtime bloom filter injected on the fact side")
      // the filter is a pure reduction: results equal the plain join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .count()
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.count() == plain)
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }
}
