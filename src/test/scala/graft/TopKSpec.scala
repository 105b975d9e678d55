package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup agrees exactly with the window formulation") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val got = TopK.topKPerGroup(orders, "o_custkey", "o_orderkey",
        "o_totalprice", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val exp = orders
      .select(col("o_custkey"), col("o_orderkey").cast("long"),
        col("o_totalprice").cast("double"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == exp && got.nonEmpty)
  }

  test("topKPerGroup ties break deterministically on the id across layouts") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 7.0),
      (2L, 20L, 1.0)).toDF("grp", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      TopK.topKPerGroup(d, "grp", "id", "v", k = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val out = run(df)
    // grp 1: 13 (7.0) then the LOWEST id among the 5.0 ties
    assert(out == Set((1L, 13L, 1), (1L, 10L, 2), (2L, 20L, 1)))
    assert(run(df.repartition(7)) == out)
  }

  test("topKPerGroupWithPayload carries the payload and matches the " +
      "payload-free selection across layouts") {
    val df = Seq(
      (1L, 10L, 5.0, 100L), (1L, 11L, 5.0, 110L), (1L, 12L, 4.0, 120L),
      (1L, 13L, 7.0, 130L), (2L, 20L, 1.0, 200L))
      .toDF("grp", "id", "v", "pay")
    def run(d: org.apache.spark.sql.DataFrame) =
      TopK.topKPerGroupWithPayload(d, "grp", "id", "v", "pay", k = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4)))
        .toSet
    val out = run(df)
    // selection identical to topKPerGroup; each row keeps ITS payload
    assert(out == Set((1L, 13L, 130L, 1), (1L, 10L, 100L, 2),
      (2L, 20L, 200L, 1)))
    assert(run(df.repartition(7)) == out)
    val sel = TopK.topKPerGroup(df, "grp", "id", "v", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(t => (t._1, t._2)) == sel)
  }

  test("topKPerGroupWithPayload EXCLUDES null-payload rows — documented " +
      "divergence from topKPerGroup's selection") {
    // id 13 is the group's top-ranked row by ord, but its payload is
    // null: the payload variant drops it up front (null has no
    // primitive slot), so id 10 takes rank 1 — while the payload-free
    // selection still ranks 13 first. Callers whose payload can be
    // null must map it to a sentinel BEFORE the aggregator if they
    // need selection parity.
    val df = Seq(
      (1L, 10L, 5.0, Some(100L)), (1L, 11L, 4.0, Some(110L)),
      (1L, 13L, 7.0, None)).toDF("grp", "id", "v", "pay")
    val withPay = TopK.topKPerGroupWithPayload(df, "grp", "id", "v",
        "pay", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(4))).toSet
    assert(withPay == Set((10L, 1), (11L, 2)))
    val noPay = TopK.topKPerGroup(df, "grp", "id", "v", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(noPay == Set((13L, 1), (10L, 2)))
  }

  test("topKPerGroup aggregates partially before the exchange (bounded shuffle)") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val out = TopK.topKPerGroup(orders, "o_custkey", "o_orderkey",
      "o_totalprice", k = 3)
    val plan = out.queryExecution.executedPlan.toString
    // typed-Aggregator top-k runs as ObjectHashAggregate with a
    // partial stage feeding the exchange — the whole point: the
    // shuffle carries k-row buffers, not the order table, and no sort
    // node appears anywhere before the exchange
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_topkagg") || plan.contains("partial_"),
      s"no partial aggregation stage in:\n$plan")
    val beforeExchange = plan.split("Exchange hashpartitioning").last
    assert(!beforeExchange.contains("Sort "),
      "group sort leaked into the pre-shuffle stage")
  }
}
