package graft

import graft.operators.Golden

/** Golden-record survivorship rules. */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  test("chain cluster merges: min-id golden key, max-quality survivor") {
    val recs = Seq((1L, 5.0, "A"), (2L, 9.0, "B"), (3L, 9.0, "C"),
      (7L, 1.0, "Z")).toDF("id", "q", "payload")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("x", "y")
    val rows = Golden.goldenRecords(recs, "id", "q", Seq("payload"),
      pairs, "x", "y").collect()
    assert(rows.length == 1) // unpaired 7 is no cluster
    val r = rows(0)
    assert(r.getAs[Long]("cluster_id") == 1L)
    assert(r.getAs[Long]("n_members") == 3L)
    assert(r.getAs[Long]("golden_id") == 1L)
    assert(r.getAs[Double]("best_q") == 9.0)
    // quality tie between 2 and 3 breaks to the smaller id → B
    assert(r.getAs[String]("rep_payload") == "B")
  }

  test("two disjoint clusters stay separate") {
    val recs = Seq((1L, 1.0, "a"), (2L, 2.0, "b"),
      (10L, 4.0, "x"), (11L, 3.0, "y")).toDF("id", "q", "payload")
    val pairs = Seq((1L, 2L), (10L, 11L)).toDF("x", "y")
    val got = Golden.goldenRecords(recs, "id", "q", Seq("payload"),
        pairs, "x", "y")
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        r.getAs[String]("rep_payload")).toMap
    assert(got == Map(1L -> "b", 10L -> "x"))
  }
}
