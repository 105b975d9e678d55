package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
// cross-engine deterministic rounding shadows functions.round
import graft.functions.Rounding.{roundTo => round}

import graft.functions.TextFunctions.token60

/** Benchmark decontamination — the n-gram-overlap check every serious
  * training-data pipeline runs before training: any document sharing
  * word n-grams with an evaluation/benchmark set is flagged (and
  * usually dropped), because training on it would leak the benchmark
  * into the model.
  *
  * Scale posture (100 TB corpus, benchmark ≪ corpus): the benchmark
  * n-gram set is reduced to DISTINCT 60-bit hashes — for a real
  * benchmark (thousands of documents) that is a few million longs, so
  * Catalyst broadcasts the contamination join and the corpus is
  * streamed through map-side with NO corpus shuffle. Per-shingle
  * fan-out is bounded by 1: the benchmark side is distinct on the join
  * key, so each corpus shingle row matches at most once. The only
  * corpus-sized aggregation is the per-document shingle count, a
  * hash-partitioned groupBy on the document id.
  */
object Decontam {

  /** Per-document contamination stats of `corpus` against `bench`:
    * `(id, n_ngrams, n_contam, contam_ratio)` for every corpus document
    * with at least one n-gram appearing anywhere in the benchmark set.
    * N-grams are distinct word `n`-grams (documents shorter than `n`
    * words degrade to one whole-text shingle); matching is on the
    * shared 60-bit md5 kernel so the operator mirrors exactly in SQL.
    *
    * SIZE PRECONDITION: the broadcast hint below is unconditional, so
    * `bench`'s distinct n-gram set must fit in executor/driver memory
    * (fine for real benchmarks — a few million longs). A benchmark too
    * large to broadcast belongs on [[Bloom.screen]], the fixed-memory
    * sketch variant of this check.
    */
  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
              textCol: String, n: Int = 3): DataFrame = {
    // per-document distinct shingle ARRAYS are produced inside the scan
    // projection (native expression + array_distinct) — set semantics
    // with NO corpus-wide distinct shuffle; exploding them yields rows
    // already distinct within each document
    def shingleHashRows(df: DataFrame): DataFrame =
      Dedup.shingleSets(df, idCol, textCol, n)
        .select(col("id"), explode(col("sh")).as("s"))
        .select(col("id"), token60(col("s")).as("h"))
    // explicit broadcast hint: the benchmark side sits behind a distinct
    // aggregate whose size ESTIMATE can exceed autoBroadcastJoinThreshold
    // even when the actual distinct set is tiny — without the hint,
    // Catalyst may silently fall back to a corpus-shuffling sort-merge
    // join, violating the documented map-side posture
    val banned = broadcast(shingleHashRows(bench).select("h").distinct())
    val contam = shingleHashRows(corpus).join(banned, "h")
      .groupBy("id").agg(count(lit(1)).as("n_contam"))
    // per-doc totals come straight off the shingle array length — a
    // second map-only corpus scan instead of a corpus-wide (id, h)
    // aggregation shuffle (the cheaper trade at 100 TB)
    val totals = Dedup.shingleSets(corpus, idCol, textCol, n)
      .select(col("id"), size(col("sh")).cast("long").as("n_ngrams"))
    // inner join: only contaminated documents are reported (docs with
    // zero overlap vastly dominate a clean corpus); the contaminated
    // side is small and broadcasts against the streaming totals scan
    totals.join(contam, "id")
      .select(col("id"), col("n_ngrams"), col("n_contam"),
        round(col("n_contam").cast("double") /
          col("n_ngrams").cast("double"), 4).as("contam_ratio"))
  }
}
