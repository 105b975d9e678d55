package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Exec

/** Dev probe (test sourceset only): stage-size breakdown of the
  * simhash near-dup pipeline at a given SF. Run with
  * `Test/runMain graft.dev.ProbeSimhash`.
  */
object ProbeSimhash {
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
    println("PROBE docs=" + docs.count())
    val sims = Exec.widen(docs, "doc_id")
      .select(col("doc_id").as("id"), simhash60(words(col("text"))).as("sim"))
      .persist()
    t("sims")(println("PROBE sims=" + sims.count()))
    val uniq = sims.select("sim").distinct()
    t("uniq")(println("PROBE uniq=" + uniq.count()))
    val banded = uniq.select(col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        call_function("shiftright", col("sim"), b * 15) % 32768))
        .as(Seq("band", "seg")))
    val joined = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.seg") === col("b.seg") &&
          col("a.sim") < col("b.sim"))
    t("rawJoin")(println("PROBE rawJoin=" + joined.count()))
    val cand = joined
      .select(col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming_dist",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int"))
      .filter(col("hamming_dist") <= 3)
      .persist()
    t("cand")(println("PROBE cand=" + cand.count()))
    val crossPairs = cand
      .join(sims.as("x"), col("sim_a") === col("x.sim"))
      .join(sims.as("y"), col("sim_b") === col("y.sim"))
    t("crossPairs")(println("PROBE crossPairs=" + crossPairs.count()))
    val samePairs = sims.as("x")
      .join(sims.as("y"),
        col("x.sim") === col("y.sim") && col("x.id") < col("y.id"))
    t("samePairs")(println("PROBE samePairs=" + samePairs.count()))
    spark.stop()
  }
}
