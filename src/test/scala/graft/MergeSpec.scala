package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeUpsert: matched updates, unmatched inserts, delete wins") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val source = Seq(
      (2L, "b2", 25.0, "U"), // update
      (4L, "d", 40.0, "I"),  // insert
      (3L, "c", 30.0, "D"),  // delete
      (1L, "a9", 99.0, "U"), // update…
      (1L, "a", 10.0, "D"))  // …but a same-batch delete wins
      .toDF("k", "name", "v", "op")
    val out = Merge.mergeUpsert(target, source, Seq("k"), opCol = Some("op"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((2L, "b2", 25.0), (4L, "d", 40.0)))
  }

  test("mergeUpsert: seqCol picks the latest change per key") {
    val target = Seq((1L, 10.0)).toDF("k", "v")
    val source = Seq((1L, 11.0, 5L), (1L, 12.0, 9L), (1L, 13.0, 2L),
        (2L, 20.0, 1L))
      .toDF("k", "v", "seq")
    val out = Merge.mergeUpsert(target, source, Seq("k"),
      seqCol = Some("seq")).orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 12.0), (2L, 20.0))) // seq 9 wins; seq column dropped
    assert(out.head.schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("mergeUpsert without opCol is a plain last-writer upsert") {
    val target = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val source = Seq((2L, 22.0), (3L, 33.0)).toDF("k", "v")
    val out = Merge.mergeUpsert(target, source, Seq("k"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 10.0), (2L, 22.0), (3L, 33.0)))
  }

  test("scd2Apply: close-and-open on change, no-op idempotent, insert new") {
    val dim = Seq(
      // key 1: one closed version + a current one (history preserved)
      (1L, "x", 5.0, 0L, Some(50L), false),
      (1L, "x", 6.0, 50L, None, true),
      (2L, "y", 7.0, 0L, None, true),
      (3L, "z", 8.0, 0L, None, true))
      .toDF("k", "seg", "bal", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "x", 9.0, 100L),  // real change → close + open
      (2L, "y", 7.0, 100L),  // no-op → nothing happens
      (9L, "n", 1.0, 100L))  // new key → insert current
      .toDF("k", "seg", "bal", "eff")
    val out = Merge.scd2Apply(dim, updates, "k", Seq("seg", "bal"), "eff")
    val rows = out.orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    assert(rows.toSeq == Seq(
      (1L, 5.0, 0L, Some(50L), false),   // old history untouched
      (1L, 6.0, 50L, Some(100L), false), // closed at eff
      (1L, 9.0, 100L, None, true),       // new current
      (2L, 7.0, 0L, None, true),         // no-op kept as-is
      (3L, 8.0, 0L, None, true),         // unmatched kept
      (9L, 1.0, 100L, None, true)))      // brand-new key
    // idempotence: re-applying the same batch changes nothing
    val again = Merge.scd2Apply(out, updates, "k", Seq("seg", "bal"), "eff")
    assert(again.count() == out.count())
    assert(again.orderBy("k", "valid_from").collect().toSeq ==
      out.orderBy("k", "valid_from").collect().toSeq)
  }

  test("mergeUpsert plan: one shuffle on the key, no cartesian") {
    val target = spark.range(1000).select(col("id").as("k"),
      (col("id") * 2.0).as("v"))
    val source = spark.range(500, 1500).select(col("id").as("k"),
      (col("id") * 3.0).as("v"))
    val merged = Merge.mergeUpsert(target, source, Seq("k"))
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(merged.count() == 1500)
  }

  test("incrementalAgg equals a from-scratch recompute") {
    val base = (1 to 300).map(i =>
      (s"g${i % 5}", BigDecimal(i).setScale(2)))
    val ins = (301 to 400).map(i =>
      (s"g${i % 7}", BigDecimal(i * 2).setScale(2)))
    val delIdx = (1 to 300).filter(_ % 3 == 0)
    val baseDf = base.toDF("g", "v")
    val prev = baseDf.groupBy("g")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("val_sum"))
    val delta = ins.map { case (g, v) => (g, v, "I") }
      .++(delIdx.map(i => (s"g${i % 5}", BigDecimal(i).setScale(2), "D")))
      .toDF("g", "v", "op")
    val got = Merge.incrementalAgg(prev, delta, Seq("g"), "v", "op")
      .select("g", "n_rows", "val_sum")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros)).toSet
    val want = base.filterNot { case (g, v) =>
        delIdx.exists(i => s"g${i % 5}" == g && BigDecimal(i).setScale(2) == v)
      }.++(ins).toDF("g", "v")
      .groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("val_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros)).toSet
    assert(got == want)
  }

  test("incrementalAgg: keys drop at zero, inconsistent deletes surface") {
    val prev = Seq(("a", 2L, BigDecimal(30).setScale(2)))
      .toDF("g", "n_rows", "val_sum")
    val delta = Seq(
      ("a", BigDecimal(10).setScale(2), "D"),
      ("a", BigDecimal(20).setScale(2), "D"),  // a's count reaches 0 → drops
      ("ghost", BigDecimal(5).setScale(2), "D")) // delete of unknown key
      .toDF("g", "v", "op")
    val out = Merge.incrementalAgg(prev, delta, Seq("g"), "v", "op")
      .collect()
    assert(!out.exists(_.getString(0) == "a"))
    // the impossible delete is RETAINED with a negative count, not hidden
    val ghost = out.filter(_.getString(0) == "ghost")
    assert(ghost.length == 1 && ghost.head.getAs[Long]("n_rows") == -1L)
  }

  test("q227 point-in-time: each fact sees its epoch's balance version") {
    // custkey 15 takes both updates (v0 1000c, v1 @100 6000c,
    // v2 @200 8000c); facts at t = 50/150/250 must each land on a
    // DIFFERENT version — the current row would leak future features
    val dir = java.nio.file.Files
      .createTempDirectory("graft_merge_pit").toString
    Seq((15L, 1, 10.0, "S"))
      .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((50L, 15L), (150L, 15L), (250L, 15L))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("q227_point_in_time")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(rows == Seq(("S", 0L, 1L, 1000L), ("S", 100L, 1L, 6000L),
      ("S", 200L, 1L, 8000L)))
  }
}
