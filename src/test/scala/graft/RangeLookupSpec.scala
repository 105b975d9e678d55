package graft

import org.apache.spark.sql.functions._
import graft.plans.RangeLookup

/** The custom range-lookup join plan ([[graft.plans.RangeLookup]]):
  * semantics vs the naive non-equi join, plan shape, partitioning
  * preservation, and the documented failure modes.
  */
class RangeLookupSpec extends SparkSpec {

  private def bands = {
    val s = spark
    import s.implicits._
    Seq((0.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 100.0, "high"))
      .toDF("lo", "hi", "band")
  }

  private def facts = {
    val s = spark
    import s.implicits._
    // values on boundaries, inside, outside, and null
    (Seq(0.0, 5.5, 10.0, 24.999, 25.0, 99.999, 100.0, -3.0)
      .map(Option(_)) :+ (None: Option[Double]))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
  }

  test("matches the naive non-equi join, [lo,hi) boundaries") {
    val got = RangeLookup.rangeLookup(facts, bands, "v", "lo", "hi")
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = facts.join(bands,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    // 100.0 is exclusive, -3 below all, null drops
    assert(!got.exists(t => t._1 == 6 || t._1 == 7 || t._1 == 8))
    // boundary 10.0 lands in "mid" (inclusive lo), 25.0 in "high"
    assert(got.contains((2L, "mid")) && got.contains((4L, "high")))
  }

  test("plans as RangeLookupJoin, not BroadcastNestedLoopJoin") {
    val df = RangeLookup.rangeLookup(facts, bands, "v", "lo", "hi")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeLookupJoin"))
    assert(!plan.contains("BroadcastNestedLoop"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("fact-side partitioning is preserved (no exchange above scan)") {
    val parts = facts.repartition(7, col("id"))
    val df = RangeLookup.rangeLookup(parts, bands, "v", "lo", "hi")
    assert(df.rdd.getNumPartitions == 7)
    // and the join result still carries every matched row
    assert(df.count() ==
      parts.join(bands, col("v") >= col("lo") && col("v") < col("hi")).count())
  }

  test("overlapping intervals are rejected, not silently first-matched") {
    val s = spark
    import s.implicits._
    val bad = Seq((0.0, 10.0, "a"), (5.0, 15.0, "b")).toDF("lo", "hi", "band")
    val e = intercept[Exception] {
      RangeLookup.rangeLookup(facts, bad, "v", "lo", "hi").collect()
    }
    assert(e.getMessage.contains("overlap"))
  }

  test("degenerate interval rejected; missing column is a clear error") {
    val s = spark
    import s.implicits._
    val bad = Seq((10.0, 10.0, "empty")).toDF("lo", "hi", "band")
    assert(intercept[Exception] {
      RangeLookup.rangeLookup(facts, bad, "v", "lo", "hi").collect()
    }.getMessage.contains("degenerate"))
    assert(intercept[IllegalArgumentException] {
      RangeLookup.rangeLookup(facts, bands, "nope", "lo", "hi")
    }.getMessage.contains("nope"))
  }

  test("filter above the join pushes down to the fact-side scan") {
    val s = spark
    import s.implicits._
    val path = "/tmp/graft_rl_facts"
    (0 until 100).map(i => (i.toLong, (i % 50).toDouble, s"p$i"))
      .toDF("id", "v", "payload").write.mode("overwrite").parquet(path)
    val pf = spark.read.parquet(path)
    val df = RangeLookup.rangeLookup(pf, bands, "v", "lo", "hi")
      .filter(col("id") > 90)
    val plan = df.queryExecution.executedPlan.toString
    // the id predicate must reach the parquet scan as a pushed filter,
    // not sit above the custom join
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"),
      s"fact predicate did not reach the scan:\n$plan")
    assert(df.count() == 9)
  }

  test("project above the join prunes the fact-side read schema") {
    val path = "/tmp/graft_rl_facts2"
    val s = spark
    import s.implicits._
    (0 until 100).map(i => (i.toLong, (i % 50).toDouble, s"p$i"))
      .toDF("id", "v", "payload").write.mode("overwrite").parquet(path)
    val pf = spark.read.parquet(path)
    val df = RangeLookup.rangeLookup(pf, bands, "v", "lo", "hi")
      .select("id", "band")
    val plan = df.queryExecution.executedPlan.toString
    // payload is unused → must not be read; v is the join key → must be
    assert(!plan.contains("payload"), s"unused column read:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint,v:double>"),
      s"fact scan not pruned:\n$plan")
    assert(df.count() == 100)
  }

  test("integer value/bound columns cast cleanly") {
    val s = spark
    import s.implicits._
    val f = Seq((1L, 3), (2L, 17), (3L, 40)).toDF("id", "v")
    val b = Seq((0, 10, "low"), (10, 50, "high")).toDF("lo", "hi", "band")
    val got = RangeLookup.rangeLookup(f, b, "v", "lo", "hi")
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "low"), (2L, "high"), (3L, "high")))
  }
}
