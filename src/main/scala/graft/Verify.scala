package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated name prefixes (dev loop only —
    // the driver always runs the full set with 2 args)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(',').toSeq) else None
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach {
      case (name, fn) =>
      spark.sparkContext.setJobDescription(s"verify: $name")
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // error sentinel: leave an EMPTY result dir (no parquet) plus
        // the exception text, so the driver's compare records an `err`
        // row for this query instead of silently dropping it — a
        // thrown query must never read as "absent" in CORRECTNESS
        try {
          val dir = Paths.get(s"$outDir/$name")
          if (Files.exists(dir)) {
            val walk = Files.walk(dir)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
            finally walk.close()
          }
          Files.createDirectories(dir)
          Files.writeString(dir.resolve("_ERROR.txt"),
            s"${e.getClass.getName}: ${e.getMessage}\n")
        } catch { case _: Throwable => () }
      }
      // operators persist reusable subplans; drop them between queries
      // so a 50-query run doesn't accumulate storage-memory pressure.
      // The RDD drain also frees leftover localCheckpoint blocks, which
      // Dataset.unpersist/clearCache never reach (they'd otherwise wait
      // for a driver GC + ContextCleaner); the Kernels memo is the one
      // deliberate cross-query cache and is kept.
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try {
        val keep = Kernels.liveRddIds
        spark.sparkContext.getPersistentRDDs.foreach {
          case (id, rdd) if !keep.contains(id) =>
            try rdd.unpersist(blocking = false)
            catch { case _: Throwable => () }
          case _ => ()
        }
      } catch { case _: Throwable => () }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
