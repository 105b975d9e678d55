package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Per-table file-layout statistics — the metadata half of lake
    * maintenance: file count, byte sizes, and the small-files symptom
    * (files under `smallBytes`). Pure filesystem listing through the
    * Hadoop FS API — no data read, works on any supported filesystem.
    */
  final case class TableStats(nFiles: Int, totalBytes: Long,
                              minBytes: Long, maxBytes: Long,
                              nSmall: Int)

  def tableStats(spark: SparkSession, dir: String,
                 smallBytes: Long = 8L << 20): TableStats = {
    val p = new Path(dir)
    val sizes = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getLen)
    if (sizes.isEmpty) TableStats(0, 0L, 0L, 0L, 0)
    else TableStats(sizes.length, sizes.sum, sizes.min, sizes.max,
      sizes.count(_ < smallBytes))
  }

  /** COMPACTION: rewrite a fragmented parquet directory into
    * `ceil(rows / rowsPerFile)` even files. The rewrite is
    * crash-safe the way format-less lakes do it: write to a
    * temporary sibling, verify the row count survived, then swap
    * directories with two renames (the table is missing only between
    * the renames — a table FORMAT's metadata pointer would close that
    * gap, and is exactly what Delta/Iceberg add on top of this same
    * rewrite). Readers pay one count job; the rewrite itself is one
    * round-robin shuffle sized by [[sizedForWrite]].
    *
    * Returns (files before, files after, rows).
    */
  def compact(spark: SparkSession, dir: String,
              rowsPerFile: Long): (Int, Int, Long) = {
    val before = tableStats(spark, dir)
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val tmp = dir.stripSuffix("/") + ".compact-tmp"
    val old = dir.stripSuffix("/") + ".compact-old"
    sizedForWrite(df, rowsPerFile, knownRows = Some(rows))
      .write.mode("overwrite").parquet(tmp)
    val rewritten = spark.read.parquet(tmp).count()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (rewritten != rows) {
      fs.delete(new Path(tmp), true)
      throw new IllegalStateException(
        s"compaction row drift: $rows -> $rewritten; original left intact")
    }
    fs.delete(new Path(old), true)
    if (!fs.rename(new Path(dir), new Path(old)))
      throw new IllegalStateException(s"could not stage $dir aside")
    if (!fs.rename(new Path(tmp), new Path(dir))) {
      fs.rename(new Path(old), new Path(dir)) // roll back
      throw new IllegalStateException(s"could not publish compacted $dir")
    }
    fs.delete(new Path(old), true) // the vacuum step
    (before.nFiles, tableStats(spark, dir).nFiles, rows)
  }
}
