package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch probe — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count()

    import graft.operators.Dedup
    val inv = Dedup.shingleRowsRaw(docs, "doc_id", "text", 3)
      .dropDuplicates("id", "s")
    t("inv")(println("PROBE inv=" + inv.count()))
    val invP = inv.persist()
    invP.count()
    val setSize = invP.groupBy("id").agg(count(lit(1)).as("sz"))
    t("setSize")(setSize.write.format("noop").mode("overwrite").save())
    val pairable = invP.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 16).select("s")
    t("pairable")(println("PROBE pairable=" + pairable.count()))
    val idx = invP.join(pairable, Seq("s"), "left_semi").persist()
    t("idx")(println("PROBE idx=" + idx.count()))
    val ii = idx.as("a").join(idx.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("ii"))
    t("ii_agg")(println("PROBE ii=" + ii.count()))
    val idxSize = idx.groupBy("id").agg(count(lit(1)).as("isz"))
    val docStats = setSize.join(idxSize, Seq("id"), "left")
      .select(col("id"), col("sz"),
        (col("sz") - coalesce(col("isz"), lit(0L))).as("hid"))
    val cand = ii
      .join(docStats.as("da"), col("doc_a") === col("da.id"))
      .join(docStats.as("db"), col("doc_b") === col("db.id"))
      .withColumn("ub_inter", col("ii") + least(col("da.hid"), col("db.hid")))
      .filter(col("ub_inter").cast("double") /
        (col("da.sz") + col("db.sz") - col("ub_inter")).cast("double")
        >= 0.8 - 0.5e-4)
      .select("doc_a", "doc_b")
    t("cand_pruned")(println("PROBE cand=" + cand.count()))
    spark.catalog.clearCache()
    t("full_q38") {
      Dedup.jaccardPairsExact(docs, "doc_id", "text", 0.8, maxShingleDf = 16)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    t("full_q38_again") {
      Dedup.jaccardPairsExact(docs, "doc_id", "text", 0.8, maxShingleDf = 16)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
