package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output-file hygiene for lake writes — the small-files problem: a
  * filtered/deduped 100 TB pass can leave thousands of partitions each
  * holding a few surviving rows, and every downstream scan then pays
  * per-file open/footer/scheduling cost far exceeding the data read.
  * The fix is sizing the write, not the computation: bound rows per
  * output file just before the sink. Plus multi-dimensional CLUSTERING
  * ([[zValue]]/[[zOrderForWrite]]): laying rows out along a
  * space-filling curve so per-file min/max statistics prune scans on
  * BOTH clustered columns, not just a lead sort key.
  */
object Lake {

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative integer columns — bit i of `x` lands at position 2i,
    * bit i of `y` at 2i+1. Nearby (x, y) points get nearby keys, so a
    * range-partitioned sort on the key gives every output file a
    * TIGHT bounding box in (x, y): a filter on either column prunes
    * files by min/max stats. Pure codegen'd bit arithmetic (2·bits
    * shift-mask terms), mirrored exactly in SQL.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1))
        .cast("long")
    }.reduce(_ + _)
  }

  /** Range-partition and sort by the Z-order key ahead of a write:
    * each output file covers one key range = one (x, y) tile. The one
    * shuffle here replaces full-table scans on every future query that
    * filters either dimension.
    */
  def zOrderForWrite(df: DataFrame, xCol: String, yCol: String,
                     bits: Int, numFiles: Int): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Repartition `df` so a subsequent write produces files of about
    * `rowsPerFile` rows (round-robin, so files are even regardless of
    * upstream skew). Costs one count job over the (already computed)
    * input — honest and exact; callers with a known cardinality can
    * pass it via `knownRows` to skip the job. Rows, not bytes, is the
    * deliberate knob: row width is schema-dependent and the caller
    * knows it; Spark's own maxRecordsPerFile splits oversized files
    * but never merges undersized ones, which is the half that hurts.
    */
  def sizedForWrite(df: DataFrame, rowsPerFile: Long,
                    knownRows: Option[Long] = None): DataFrame = {
    require(rowsPerFile >= 1, "rowsPerFile must be >= 1")
    val n = knownRows.getOrElse(df.count())
    val parts = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile)
    require(parts <= Int.MaxValue, "partition count overflow")
    df.repartition(parts.toInt)
  }
}
