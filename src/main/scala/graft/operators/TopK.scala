package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k without sorting the groups — the aggregation-based
  * alternative to the `row_number() OVER (PARTITION BY …) <= k` window.
  *
  * Why it matters at 100 TB: the window formulation shuffles EVERY row
  * to its group's partition and sorts whole groups just to discard all
  * but k rows. This operator keeps a bounded k-slot buffer per group
  * inside a typed `Aggregator`, so the map-side partial aggregation
  * reduces each partition to ≤ k rows per group BEFORE the shuffle —
  * the exchange carries O(groups × partitions × k) rows instead of the
  * corpus, and nothing is ever globally sorted. Same trick Spark
  * itself applies to global top-k (`TakeOrderedAndProject`), extended
  * to the grouped case it does not cover.
  *
  * Ordering is (ord desc, id asc) — the id tie-break makes the
  * selection total and therefore deterministic across partitionings
  * and engines (a bare float ordering would select arbitrary rows
  * among ties).
  */
object TopK {

  /** Bounded buffer: parallel arrays sorted by (ord desc, id asc),
    * length ≤ k. */
  case class Buf(ids: Array[Long], ords: Array[Double])

  class TopKAgg(k: Int) extends Aggregator[(Long, Double), Buf, Buf] {
    require(k >= 1, "k must be >= 1")

    private def better(id1: Long, o1: Double, id2: Long, o2: Double): Boolean =
      o1 > o2 || (o1 == o2 && id1 < id2)

    override def zero: Buf = Buf(Array.empty, Array.empty)

    override def reduce(b: Buf, row: (Long, Double)): Buf = {
      val (id, ord) = row
      val n = b.ids.length
      if (n == k && !better(id, ord, b.ids(n - 1), b.ords(n - 1))) b
      else {
        // insert in order, trim to k — O(k) per row, k is small
        var pos = n
        while (pos > 0 && better(id, ord, b.ids(pos - 1), b.ords(pos - 1)))
          pos -= 1
        val m = math.min(n + 1, k)
        val ids = new Array[Long](m)
        val ords = new Array[Double](m)
        var i = 0
        while (i < m) {
          if (i < pos) { ids(i) = b.ids(i); ords(i) = b.ords(i) }
          else if (i == pos) { ids(i) = id; ords(i) = ord }
          else { ids(i) = b.ids(i - 1); ords(i) = b.ords(i - 1) }
          i += 1
        }
        Buf(ids, ords)
      }
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val m = math.min(a.ids.length + b.ids.length, k)
      val ids = new Array[Long](m)
      val ords = new Array[Double](m)
      var (i, j, o) = (0, 0, 0)
      while (o < m) {
        val takeA = j >= b.ids.length || (i < a.ids.length &&
          better(a.ids(i), a.ords(i), b.ids(j), b.ords(j)))
        if (takeA) { ids(o) = a.ids(i); ords(o) = a.ords(i); i += 1 }
        else { ids(o) = b.ids(j); ords(o) = b.ords(j); j += 1 }
        o += 1
      }
      Buf(ids, ords)
    }

    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** [[Buf]] plus one LONG payload column carried through the
    * selection — for callers that would otherwise pay a second corpus
    * scan to re-attach a single value (the q382 sketch: the payload is
    * the quantized measure, so sketch rows come out of ONE pass). */
  case class BufP(ids: Array[Long], ords: Array[Double],
                  pays: Array[Long])

  class TopKPayloadAgg(k: Int)
      extends Aggregator[(Long, Double, Long), BufP, BufP] {
    require(k >= 1, "k must be >= 1")

    private def better(id1: Long, o1: Double, id2: Long, o2: Double): Boolean =
      o1 > o2 || (o1 == o2 && id1 < id2)

    override def zero: BufP = BufP(Array.empty, Array.empty, Array.empty)

    override def reduce(b: BufP, row: (Long, Double, Long)): BufP = {
      val (id, ord, pay) = row
      val n = b.ids.length
      if (n == k && !better(id, ord, b.ids(n - 1), b.ords(n - 1))) b
      else {
        var pos = n
        while (pos > 0 && better(id, ord, b.ids(pos - 1), b.ords(pos - 1)))
          pos -= 1
        val m = math.min(n + 1, k)
        val ids = new Array[Long](m)
        val ords = new Array[Double](m)
        val pays = new Array[Long](m)
        var i = 0
        while (i < m) {
          if (i < pos) { ids(i) = b.ids(i); ords(i) = b.ords(i); pays(i) = b.pays(i) }
          else if (i == pos) { ids(i) = id; ords(i) = ord; pays(i) = pay }
          else { ids(i) = b.ids(i - 1); ords(i) = b.ords(i - 1); pays(i) = b.pays(i - 1) }
          i += 1
        }
        BufP(ids, ords, pays)
      }
    }

    override def merge(a: BufP, b: BufP): BufP = {
      val m = math.min(a.ids.length + b.ids.length, k)
      val ids = new Array[Long](m)
      val ords = new Array[Double](m)
      val pays = new Array[Long](m)
      var (i, j, o) = (0, 0, 0)
      while (o < m) {
        val takeA = j >= b.ids.length || (i < a.ids.length &&
          better(a.ids(i), a.ords(i), b.ids(j), b.ords(j)))
        if (takeA) { ids(o) = a.ids(i); ords(o) = a.ords(i); pays(o) = a.pays(i); i += 1 }
        else { ids(o) = b.ids(j); ords(o) = b.ords(j); pays(o) = b.pays(j); j += 1 }
        o += 1
      }
      BufP(ids, ords, pays)
    }

    override def finish(b: BufP): BufP = b
    override def bufferEncoder: Encoder[BufP] = Encoders.product[BufP]
    override def outputEncoder: Encoder[BufP] = Encoders.product[BufP]
  }

  /** [[topKPerGroup]] with a LONG payload column carried through:
    * `(<keyCol>, <idCol>, <ordCol>, <payCol>, rk [, extras…])`. Same
    * total order and null-exclusion contract; a null payload is
    * excluded too (it has no primitive slot) — TopKSpec documents the
    * resulting selection divergence from [[topKPerGroup]].
    *
    * `extraAggs`: additional ALIASED aggregate columns computed in the
    * SAME per-group aggregation (e.g. `count(lit(1)).as("n")`), their
    * value repeated on each of the group's ≤ k output rows. This is
    * how a sketch query carries exact per-group context (row counts,
    * weight totals) without a second corpus scan — one pass produces
    * the bounded sketch AND its full-data aggregates. They evaluate
    * over the null-FILTERED input (the aggregator's contract), so
    * callers whose extras must see dropped rows aggregate separately.
    */
  def topKPerGroupWithPayload(df: DataFrame, keyCol: String, idCol: String,
                              ordCol: String, payCol: String,
                              k: Int,
                              extraAggs: Seq[Column] = Nil): DataFrame = {
    val fn = udaf(new TopKPayloadAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
        Encoders.scalaLong))
    val aggs = fn(col(idCol).cast("long"), col(ordCol).cast("double"),
      col(payCol).cast("long")).as("top") +: extraAggs
    val agged = df.filter(col(idCol).isNotNull && col(ordCol).isNotNull &&
        col(payCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
    // the extras' output names come from the aggregated schema (the
    // columns after keyCol and the top-k buffer), so callers' aliases
    // flow through without touching expression internals
    val extraNames = agged.columns.drop(2).toSeq
    agged
      .select(col(keyCol) +: posexplode(arrays_zip(col("top.ids"),
          col("top.ords"), col("top.pays"))).as(Seq("i", "r")) +:
        extraNames.map(col): _*)
      .select(col(keyCol) +: col("r.ids").as(idCol) +:
        col("r.ords").as(ordCol) +: col("r.pays").as(payCol) +:
        (col("i") + 1).cast("int").as("rk") +: extraNames.map(col): _*)
  }

  /** Top `k` rows per group of `df`: `(<keyCol>, <idCol>, <ordCol>,
    * rk)` by (`ordCol` desc, `idCol` asc), rk = 1-based rank within
    * the group. `idCol`/`ordCol` must be castable to bigint/double
    * (the bounded buffer is primitive-typed on purpose — payload
    * columns re-attach with an id equi-join against the tiny result,
    * or ride along via [[topKPerGroupWithPayload]] when they fit a
    * LONG). Rows with a null id or ord are EXCLUDED up front: null
    * has no position in the (ord desc, id asc) total order, and
    * letting one reach the primitive-typed buffer would fail with an
    * opaque encoder NPE instead of defined semantics.
    */
  def topKPerGroup(df: DataFrame, keyCol: String, idCol: String,
                   ordCol: String, k: Int): DataFrame = {
    // untyped udaf registration keeps the group key's native type
    val fn = udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    df.filter(col(idCol).isNotNull && col(ordCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(fn(col(idCol).cast("long"), col(ordCol).cast("double")).as("top"))
      .select(col(keyCol),
        posexplode(arrays_zip(col("top.ids"), col("top.ords")))
          .as(Seq("i", "r")))
      .select(col(keyCol), col("r.ids").as(idCol), col("r.ords").as(ordCol),
        (col("i") + 1).cast("int").as("rk"))
  }
}
