package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup
import graft.functions.TextFunctions.words

/** Dev profiling harness (test scope): q127 persist-strategy shootout.
  * Run: `sbt "Test/runMain graft.tools.ProfileQ127c"`.
  */
object ProfileQ127c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def docs = {
      val docs0 = spark.read.parquet(d + "/documents.parquet")
        .select(col("doc_id"), col("text"))
      val ws = words(col("text"))
      val synth = docs0
        .filter(pmod(col("doc_id"), lit(25)) === 0 && size(ws) >= 6)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(slice(ws, lit(1),
            floor(size(ws) / lit(2.0)).cast("int")), " ").as("text"))
      docs0.unionByName(synth)
    }
    val cap = 8

    def run(persistWithDf: Boolean, persistCand: Boolean,
            persistSets: Boolean): Long = {
      val handles = scala.collection.mutable.ArrayBuffer[DataFrame]()
      def maybe(df: DataFrame, p: Boolean): DataFrame =
        if (p) { val c = df.persist(StorageLevel.MEMORY_AND_DISK)
                 handles += c; c } else df
      val inv = Dedup.shingleSets(docs, "doc_id", "text", 3)
        .select(col("id"), explode(col("sh")).as("s"))
      val dfTab = inv.groupBy("s").agg(count(lit(1)).as("df"))
      val withDf = maybe(inv.join(dfTab, Seq("s")), persistWithDf)
      val docStats = withDf.groupBy("id").agg(
        count(lit(1)).as("sz"),
        sum(when(col("df") > cap, 1L).otherwise(0L)).as("hid"))
      val idx = withDf.filter(col("df") >= 2 && col("df") <= cap)
        .select("id", "s")
      val ii = idx.as("a")
        .join(idx.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
        .agg(count(lit(1)).as("ii"))
      val margin = 0.5e-4
      val cand = maybe(ii
        .join(docStats.as("da"), col("doc_a") === col("da.id"))
        .join(docStats.as("db"), col("doc_b") === col("db.id"))
        .withColumn("ub_inter",
          (col("ii") + least(col("da.hid"), col("db.hid"))).cast("double"))
        .filter(col("ub_inter") / col("da.sz") >= 0.9 - margin ||
          col("ub_inter") / col("db.sz") >= 0.9 - margin)
        .select("doc_a", "doc_b"), persistCand)
      val idsU = cand.select(col("doc_a").as("cid"))
        .unionByName(cand.select(col("doc_b").as("cid"))).distinct()
      val cdocs = docs.join(idsU, col("doc_id") === col("cid"), "left_semi")
      val sets = maybe(Dedup.shingleSets(cdocs, "doc_id", "text", 3),
        persistSets)
      val withInter = cand
        .join(sets.as("x"), col("doc_a") === col("x.id"))
        .join(sets.as("y"), col("doc_b") === col("y.id"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("x.sh"), col("y.sh")))
            .cast("double").as("inter"),
          size(col("x.sh")).cast("double").as("sa"),
          size(col("y.sh")).cast("double").as("sb"))
      val dirA = withInter.select(col("doc_a").as("inner_doc"),
        col("doc_b").as("outer_doc"), (col("inter") / col("sa")).as("c"))
      val dirB = withInter.select(col("doc_b").as("inner_doc"),
        col("doc_a").as("outer_doc"), (col("inter") / col("sb")).as("c"))
      val result = dirA.unionByName(dirB).filter(col("c") >= 0.9)
      val out = result.persist(StorageLevel.MEMORY_AND_DISK)
      val n = out.count()
      handles.foreach(_.unpersist(blocking = false))
      out.unpersist(blocking = false)
      n
    }
    for (v <- Seq(("all", true, true, true), ("wdf", true, false, false),
                  ("none", false, false, false))) {
      run(v._2, v._3, v._4) // prime
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = run(v._2, v._3, v._4)
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"VARIANT ${v._1}%-5s median ${times.map(_._1).sorted.apply(1)}%.2f s rows ${times.head._2}")
    }
    spark.stop()
  }
}
