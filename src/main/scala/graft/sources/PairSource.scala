package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Faithful counterpart of the reference's ingest surface
  * (`/root/reference/kernel.cu:92-104`): the reference scanf-reads `m`
  * whitespace-separated `(x, y)` double pairs from stdin. Here the
  * pairs are staged to a file (one `x y` pair per line) and read
  * through Spark's CSV source with an explicit schema — distributed,
  * splittable, and with malformed-row policy instead of undefined
  * scanf behavior. The row count is COUNTED, not user-supplied: the
  * reference trusts the typed-in `m` and silently truncates to
  * `m/size·size` rows (`kernel.cu:108`), which this engine deliberately
  * does not reproduce (SURVEY.md §0.3).
  */
object PairSource {

  val schema: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  /** The explicit not-null filter (on top of DROPMALFORMED) matters:
    * Catalyst prunes all columns under a bare count(), skipping value
    * parsing entirely, so malformed rows would otherwise be counted.
    */
  def readPairs(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", " ")
      .option("mode", "DROPMALFORMED")
      .csv(path)
      .filter(col("x").isNotNull && col("y").isNotNull)
      .select(col("x"), col("y"))
}
