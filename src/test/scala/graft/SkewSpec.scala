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
}
