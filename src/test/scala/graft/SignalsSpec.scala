package graft

import org.apache.spark.sql.functions._

import graft.queries.Signals

/** Unit-level checks for the round-7 signal operators, on hand-
  * computable inputs (the query-level DuckDB gate covers the corpus
  * path; these pin the kernels' semantics).
  */
class SignalsSpec extends SparkSpec {
  import spark.implicits._

  test("k-center coreset picks opposite corners of a square first") {
    // 4 unit vectors at 0°, 90°, 180°, 270° in 2-D plus a near-copy of
    // the seed: greedy from min id (0°) must take 180° next (cosine
    // distance 2.0), then one of the ±90° pair (distance 1.0), and the
    // near-copy dead last
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(-1f, 0f)), (4L, Array(0f, -1f)),
      (5L, Array(0.999f, 0.001f))).toDF("vec_id", "embedding")
    // running the full query needs a staged parquet dir; exercise the
    // distance/argmax kernel exactly the way q196 composes it instead
    import graft.functions.VectorFunctions
    def dq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.Rounding.roundTo((lit(1.0) -
        VectorFunctions.dot(a, b) /
          (VectorFunctions.norm(a) * VectorFunctions.norm(b))) * 1e6, 0)
        .cast("long")
    val c1 = emb.filter(col("vec_id") === 1L)
      .select(col("embedding").as("c"))
    val d1 = emb.crossJoin(broadcast(c1))
      .select(col("vec_id"), dq(col("embedding"), col("c")).as("md"))
    val far = d1.orderBy(col("md").desc, col("vec_id")).head()
    assert(far.getLong(0) == 3L && far.getLong(1) == 2000000L)
  }

  test("debounce fold: kept-anchored, not lag-anchored") {
    // events at t = 0, 50, 80, 200 with grace 60: lag-anchored would
    // drop 80 (gap 30 from 50) but KEEP 50's successor chain wrongly —
    // kept-anchored keeps 0, drops 50 (within 60 of kept 0), KEEPS 80
    // (gap 80 from kept 0 > 60), drops nothing else until 200
    val ev = Seq((1L, "a", 0L, 10L), (1L, "a", 50L, 11L),
      (1L, "a", 80L, 12L), (1L, "a", 200L, 13L))
      .toDF("user_id", "event_type", "tu", "event_id")
    val kept = ev.groupBy("user_id", "event_type")
      .agg(array_sort(collect_list(struct(col("tu"), col("event_id"))))
        .as("evs"))
      .select(aggregate(
        slice(col("evs"), lit(2), greatest(size(col("evs")) - 1, lit(0))),
        struct(lit(1L).as("n_kept"),
          element_at(col("evs"), 1).getField("tu").as("last")),
        (acc, e) => {
          val keep = e.getField("tu") - acc.getField("last") > 60L
          struct((acc.getField("n_kept") + when(keep, 1L).otherwise(0L))
            .as("n_kept"),
            when(keep, e.getField("tu")).otherwise(acc.getField("last"))
              .as("last"))
        }).getField("n_kept").as("n_kept"))
    assert(kept.head().getLong(0) == 3L) // 0, 80, 200 kept; 50 dropped
  }

  test("Signals query registry is consistent") {
    assert(Signals.queries.keySet == Signals.oracles.keySet)
    assert(Signals.queries.keys.forall(_.matches("q\\d{3}_[a-z0-9_]+")))
  }
}
