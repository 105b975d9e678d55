package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the unsalted join result on skewed keys") {
    // 90% of fact rows share one hot key
    val facts = (1 to 1000).map(i =>
      (if (i <= 900) 1L else i.toLong % 7, i.toLong)).toDF("k", "v")
    val dim = (0 to 9).map(i => (i.toLong, s"name$i")).toDF("k", "name")
    val salted = Skew.saltedJoin(facts, dim, "k", saltFactor = 8)
      .select("v", "name").collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted
    val plain = facts.join(dim, Seq("k"))
      .select("v", "name").collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted
    assert(salted.length == 1000)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join drops fact rows with no dimension match (inner semantics)") {
    val facts = Seq((42L, 1L), (1L, 2L)).toDF("k", "v")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val out = Skew.saltedJoin(facts, dim, "k", 4).collect()
    assert(out.length == 1 && out.head.getAs[Long]("v") == 2L)
  }

  test("AQE detects and splits a skewed join partition at runtime (skew=true)") {
    // the engine's OTHER skew lever besides explicit salting: AQE's
    // OptimizeSkewedJoin re-plans an oversized shuffle partition into
    // sub-splits at runtime — the mechanism the operators rely on when
    // skew is data-dependent and unknown at authoring time
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // one hot key carries 50k rows (~1.6 MB shuffled), the rest are tiny
      val fact = spark.range(0, 50000)
        .select(lit(0L).as("k"), col("id").as("v"))
        .unionAll(spark.range(0, 10000)
          .select((col("id") % 1000 + 1).as("k"), col("id").as("v")))
      val dim = spark.range(0, 1001).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val j = fact.join(dim, "k").agg(sum("v").as("sv"), sum("w").as("sw"))
      val row = j.collect().head
      assert(row.getLong(0) > 0)
      // the FINAL adaptive plan must mark the sort-merge join as skew-split
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
