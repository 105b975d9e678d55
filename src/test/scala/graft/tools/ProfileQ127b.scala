package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup
import graft.functions.TextFunctions.words

/** Dev profiling harness (test scope): breakdown of the q127 first
  * materialization. Run: `sbt "Test/runMain graft.tools.ProfileQ127b"`.
  */
object ProfileQ127b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
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
    timed("scan") { println("  docs " + docs0.count()) }
    val ws = words(col("text"))
    val synth = docs0
      .filter(pmod(col("doc_id"), lit(25)) === 0 && size(ws) >= 6)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(ws, lit(1),
          floor(size(ws) / lit(2.0)).cast("int")), " ").as("text"))
    val docs = docs0.unionByName(synth)
    val inv = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .select(col("id"), explode(col("sh")).as("s"))
    timed("inv1") { println("  inv " + inv.count()) }
    timed("inv2") { println("  inv " + inv.count()) }
    val dfTab = inv.groupBy("s").agg(count(lit(1)).as("df"))
    timed("dfTab") { println("  dfTab " + dfTab.count()) }
    val withDf = inv.join(dfTab, Seq("s"))
    timed("joinNoP") { println("  withDf " + withDf.count()) }
    val withDfP = inv.join(dfTab, Seq("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("joinPers") { println("  withDf " + withDfP.count()) }
    withDfP.queryExecution.executedPlan.toString.split('\n')
      .filter(l => l.contains("Exchange") || l.contains("Reused"))
      .foreach(println)
    spark.stop()
  }
}
