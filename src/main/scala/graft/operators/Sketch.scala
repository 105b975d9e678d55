package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.token60

/** Count-Min sketch — fixed-memory approximate frequency counting
  * (Cormode & Muthukrishnan), the point-query companion to the
  * membership Bloom filter ([[Bloom]]) and the top-k Misra-Gries
  * sketch ([[Frequent]]): estimate the count of ANY key from a
  * `depth × width` grid of counters, with one-sided error (estimates
  * never undercount; overcount ≤ εN with probability 1−δ for
  * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉).
  *
  * Scale posture (100 TB): the sketch is a typed `Aggregator` whose
  * buffer is a flat `depth·width` long array — map-side partials
  * absorb each partition's items locally and the shuffle carries ONE
  * buffer per partition regardless of key cardinality (the same
  * bounded-state shape as [[Frequent.MisraGriesAgg]]). Probing is a
  * broadcast of the finished (small, constant-size) sketch row against
  * the probe keys — no corpus re-scan per query.
  *
  * Hashing mirrors [[Bloom]]: the shared 60-bit md5 kernel
  * ([[token60]]) + Kirsch–Mitzenmacher double hashing
  * `pos_i = (h mod width + i·(1 + h mod (width−1))) mod width`, so
  * every counter cell — and therefore every estimate, collisions
  * included — reproduces exactly in the DuckDB oracle.
  */
object Sketch {

  /** Finished sketch as an encoder-friendly product (flattens to one
    * `sketch: array<bigint>` column under `toColumn`). */
  case class CMS(sketch: Array[Long])

  /** Flat CMS buffer: row i of the grid occupies
    * `[i·width, (i+1)·width)`. */
  class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[Long, Array[Long], CMS] {
    require(depth >= 1 && width >= 2,
      "CMS needs depth >= 1 and width >= 2 (double hashing mods by width-1)")

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < depth) {
        buf(i * width + Sketch.cell(h, i, width)) += 1L
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): CMS = CMS(buf)
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[CMS] = Encoders.product[CMS]
  }

  /** Counter cell of hash `h` in grid row `i` (Kirsch–Mitzenmacher;
    * `h` is the non-negative 60-bit kernel so the mods stay positive).
    */
  private[operators] def cell(h: Long, i: Int, width: Int): Int =
    (((h % width) + i * (1 + h % (width - 1))) % width).toInt

  /** Column form of [[cell]] — identical arithmetic, for probing. */
  private def cellCol(h: Column, i: Int, width: Int): Column =
    (h % width + lit(i) * (lit(1) + h % (width - 1))) % width

  /** Build the sketch over `items(keyCol)` (strings; hashed through the
    * shared md5 kernel): a ONE-ROW DataFrame `(sketch: array<bigint>)`.
    */
  def countMin(items: DataFrame, keyCol: String, depth: Int,
               width: Int): DataFrame = {
    import items.sparkSession.implicits._
    val agg = new CountMinAgg(depth, width)
    items.select(token60(col(keyCol)).as("h")).as[Long]
      .select(agg.toColumn.name("sketch"))
      .toDF()
  }

  /** Point-query estimates: for each probe key, the minimum counter
    * across the grid rows — `(<keyCol>, cms_est)`. The one-row sketch
    * side broadcasts; estimates never undercount the true frequency.
    */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame = {
    val h = token60(col(keyCol))
    val est = least((0 until depth).map(i =>
      element_at(col("sketch"), cellCol(h, i, width).cast("int") +
        lit(i * width) + 1)): _*)
    probes.crossJoin(broadcast(sketch))
      .select(col(keyCol), est.as("cms_est"))
  }
}
