package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup
import graft.functions.TextFunctions.words

/** Dev profiling harness (test scope — never ships): times each stage
  * of the q127 containment kernel at sf0.1 to direct optimization.
  * Run: `sbt "Test/runMain graft.tools.ProfileQ127"`.
  */
object ProfileQ127 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d = "/root/testdata/sf0.1"
    val docs0 = spark.read.parquet(d + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ws = words(col("text"))
    val synth = docs0
      .filter(pmod(col("doc_id"), lit(25)) === 0 && size(ws) >= 6)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(ws, lit(1),
          floor(size(ws) / lit(2.0)).cast("int")), " ").as("text"))
    val docs = docs0.unionByName(synth)
    val cap = 8
    val inv = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .select(col("id"), explode(col("sh")).as("s"))
    val dfTab = inv.groupBy("s").agg(count(lit(1)).as("df"))
    val withDf = inv.join(dfTab, Seq("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("withDf") { println("  rows " + withDf.count()) }
    val docStats = withDf.groupBy("id").agg(
      count(lit(1)).as("sz"),
      sum(when(col("df") > cap, 1L).otherwise(0L)).as("hid")).persist()
    timed("docStats") { docStats.count() }
    val idx = withDf.filter(col("df") >= 2 && col("df") <= cap)
      .select("id", "s")
    timed("idxcount") { println("  idx rows " + idx.count()) }
    val ii = idx.as("a")
      .join(idx.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("ii")).persist()
    timed("ii") { println("  ii rows " + ii.count()) }
    val margin = 0.5e-4
    val cand = ii
      .join(docStats.as("da"), col("doc_a") === col("da.id"))
      .join(docStats.as("db"), col("doc_b") === col("db.id"))
      .withColumn("ub_inter",
        (col("ii") + least(col("da.hid"), col("db.hid"))).cast("double"))
      .filter(col("ub_inter") / col("da.sz") >= 0.9 - margin ||
        col("ub_inter") / col("db.sz") >= 0.9 - margin)
      .select("doc_a", "doc_b").persist(StorageLevel.MEMORY_AND_DISK)
    timed("cand") { println("  cand rows " + cand.count()) }
    val idsU = cand.select(col("doc_a").as("cid"))
      .unionByName(cand.select(col("doc_b").as("cid"))).distinct()
    val cdocs = docs.join(idsU, col("doc_id") === col("cid"), "left_semi")
    val sets = Dedup.shingleSets(cdocs, "doc_id", "text", 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("sets") { println("  sets rows " + sets.count()) }
    val withInter = cand
      .join(sets.as("x"), col("doc_a") === col("x.id"))
      .join(sets.as("y"), col("doc_b") === col("y.id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("x.sh"), col("y.sh")))
          .cast("double").as("inter"))
    timed("verify") { println("  verify rows " + withInter.count()) }
    spark.stop()
  }
}
