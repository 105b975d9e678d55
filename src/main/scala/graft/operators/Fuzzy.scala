package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (approximate-string) self-join — finding pairs within edit
  * distance 1 WITHOUT an all-pairs levenshtein pass, via the symmetric
  * deletion neighborhood (the SymSpell candidate scheme): two strings
  * with edit distance ≤ 1 (one substitution, insertion, or deletion)
  * necessarily share an entry of `{s} ∪ {s minus one character}`, so
  * candidates come from an equi-join on those variants and only the
  * survivors pay the exact distance check.
  *
  * Scale posture (100 TB of short strings — titles, names, queries):
  * per-string fan-out is `len + 1` variant rows produced inside the
  * scan projection (codegen'd lambda, no shuffle to generate), the
  * candidate step is a variant-keyed shuffle join AQE can rebalance,
  * and the levenshtein verification runs only on candidate pairs —
  * never corpus². The scheme is exact for distance ≤ 1: no recall
  * loss, unlike an LSH approach.
  */
object Fuzzy {

  /** Distinct pairs with `levenshtein ≤ 1` (excluding exact equals of
    * the same row; equal STRINGS on different rows pair at distance
    * 0): `(id_a, id_b, str_a, str_b, dist)`, `id_a < id_b`. Intended
    * for short-string columns — fan-out is one variant row per
    * character.
    */
  def editDistance1Pairs(df: DataFrame, idCol: String,
                         strCol: String): DataFrame = {
    val s = col(strCol)
    // {s} ∪ one-character deletions, built inside the scan projection
    val variants = concat(
      array(s),
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))
    val v = df.select(col(idCol).as("id"), s.as("str"),
      explode(variants).as("v"))
    v.as("a").join(v.as("b"),
        col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.str").as("str_a"), col("b.str").as("str_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= 1)
  }
}
