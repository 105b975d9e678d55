package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.token60

/** Bloom-filter benchmark decontamination — the fixed-memory variant of
  * [[Decontam.overlap]] for when even the DISTINCT benchmark n-gram
  * hash set is too large to ship comfortably: the benchmark side is
  * folded into an `m`-bit Bloom bitmap (a few MB REGARDLESS of
  * benchmark size), broadcast once, and the corpus streams through a
  * map-only bit-probe — no join, no corpus shuffle, no per-executor
  * state beyond the bitmap.
  *
  * The price is one-sided error: a corpus n-gram can false-positive
  * with probability ≈ (1 − e^{−kn/m})^k (never false-negative — real
  * contamination is always flagged), so the operator reports
  * bloom-POSITIVE counts: a screening pass whose hits feed the exact
  * [[Decontam.overlap]] verifier, mirroring the LSH→exact-Jaccard
  * two-stage shape of the dedup operators.
  *
  * Everything is composed from built-in codegen'd expressions (bit_or
  * aggregation, map_from_entries, element_at + bitwise test) — the
  * bitmap is a SPARSE map of 64-bit words, so a lightly-loaded filter
  * broadcasts only its non-zero words. Probe hashes derive from the
  * shared 60-bit md5 kernel by double hashing (Kirsch–Mitzenmacher:
  * pᵢ = (h₁ + i·h₂) mod m), pure integer math that mirrors exactly in
  * the DuckDB oracle — both engines agree bit-for-bit on every
  * false positive.
  */
object Bloom {

  /** The i-th probe position of hash column `h` (nonneg 60-bit). */
  private def position(h: Column, i: Int, mBits: Int): Column = {
    val h1 = pmod(h, lit(mBits.toLong))
    val h2 = pmod(h, lit((mBits - 1).toLong)) + lit(1L)
    pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))
  }

  /** One-row DataFrame `(bmap: map<bigint,bigint>)`: the Bloom bitmap
    * of every distinct word n-gram of `bench`, as a sparse map from
    * 64-bit-word index to word value. */
  def sketch(bench: DataFrame, idCol: String, textCol: String,
             n: Int = 3, mBits: Int = 1 << 20,
             numHashes: Int = 3): DataFrame = {
    require(mBits % 64 == 0 && mBits > 64, "mBits must be a multiple of 64")
    require(numHashes >= 1, "numHashes must be >= 1")
    val hashes = Dedup.shingleSets(bench, idCol, textCol, n)
      .select(explode(col("sh")).as("s"))
      .select(token60(col("s")).as("h"))
    val positions = hashes.select(
        explode(array((0 until numHashes).map(i =>
          position(col("h"), i, mBits)): _*)).as("p"))
      .distinct()
    positions
      .select((col("p") / 64).cast("long").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("bits"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
        .as("bmap"))
  }

  /** Per-document screening report of `corpus` against a broadcast
    * Bloom `sketch`: `(id, n_ngrams, n_flagged, flag_ratio)` for every
    * document with ≥ 1 bloom-positive n-gram. Map-only over the corpus:
    * the only corpus-sized aggregation is the per-document flag count,
    * keyed by the document id. */
  def screen(corpus: DataFrame, sketchRow: DataFrame, idCol: String,
             textCol: String, n: Int = 3, mBits: Int = 1 << 20,
             numHashes: Int = 3): DataFrame = {
    def bitSet(i: Int): Column = {
      val p = col(s"p$i")
      (coalesce(element_at(col("bmap"), (p / 64).cast("long")), lit(0L))
        .bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p$i % 64 AS INT))"))
        =!= 0L)
    }
    val withPos = (0 until numHashes).foldLeft(
      Dedup.shingleSets(corpus, idCol, textCol, n)
        .select(col("id"), explode(col("sh")).as("s"))
        .select(col("id"), token60(col("s")).as("h"))
        .crossJoin(broadcast(sketchRow))) { (df, i) =>
      df.withColumn(s"p$i", position(col("h"), i, mBits))
    }
    val probed = withPos.select(col("id"),
      (0 until numHashes).map(bitSet).reduce(_ && _).as("hit"))
    probed.groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_ngrams"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_flagged"))
      .filter(col("n_flagged") > 0)
      .select(col("id"), col("n_ngrams"), col("n_flagged"),
        graft.functions.Rounding.roundTo(
          col("n_flagged").cast("double") / col("n_ngrams").cast("double"), 4)
          .as("flag_ratio"))
  }
}
