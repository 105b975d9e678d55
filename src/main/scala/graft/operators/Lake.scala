package graft.operators

import org.apache.spark.sql.DataFrame

/** Output-file hygiene for lake writes — the small-files problem: a
  * filtered/deduped 100 TB pass can leave thousands of partitions each
  * holding a few surviving rows, and every downstream scan then pays
  * per-file open/footer/scheduling cost far exceeding the data read.
  * The fix is sizing the write, not the computation: bound rows per
  * output file just before the sink.
  */
object Lake {

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
