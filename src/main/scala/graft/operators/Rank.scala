package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
// cross-engine deterministic rounding shadows functions.round
import graft.functions.Rounding.{roundTo => round}

import graft.functions.TextFunctions.words

/** BM25 keyword relevance — the lexical retrieval scorer used to mine
  * topical subsets out of a web-scale corpus (and the baseline every
  * embedding retriever is compared against). Okapi BM25 per Robertson &
  * Walker: for query terms q over document d,
  *
  *   score(d) = Σ_q idf(q) · tf(q,d)·(k1+1) /
  *                         (tf(q,d) + k1·(1 − b + b·|d|/avgdl))
  *
  * with `idf(q) = ln(1 + (N − df(q) + 0.5)/(df(q) + 0.5))` (the
  * non-negative "plus one" idf variant).
  *
  * Scale posture (100 TB corpus, query of a handful of terms): term
  * matching is a codegen'd `isin` against the term literals inside the
  * scan projection — no join, no shuffle to find matches. The only
  * corpus-wide shuffles are the two hash aggregations on the document
  * id (term frequencies, then the per-document score sum). Everything
  * term-keyed — document frequencies, idf — is at most |terms| rows
  * and broadcasts; the corpus-level scalars (N, avgdl) are a one-row
  * aggregate cross-joined in (Catalyst broadcasts the single row).
  */
object Rank {

  /** BM25 scores: `(<idCol>, n_matched, score)` for every document
    * matching at least one query term. `terms` must be non-empty and
    * whitespace-free (they are matched against the shared whitespace
    * tokenization).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      "query terms must be non-empty single tokens")
    // per-document token array once: length feeds |d|, the explode
    // feeds term matching
    val toks = docs.select(col(idCol).as("id"),
      words(col(textCol)).as("w"))
    val dl = toks.select(col("id"), size(col("w")).cast("double").as("dl"))
    // corpus scalars: one row; each attach point broadcast()s it so the
    // nested-loop join's build side is pinned deterministically (AQE
    // would usually pick it anyway, but the hint removes the
    // size-estimate gamble, like every sibling operator's 1-row attach)
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // term frequencies restricted to query terms BEFORE the shuffle:
    // the isin filter runs in the scan projection, so the aggregation
    // input is matched tokens only, not the corpus token stream
    val tf = toks.select(col("id"), explode(col("w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("id", "tok").agg(count(lit(1)).cast("double").as("tf"))
    // document frequency and idf per term — at most |terms| rows
    val idf = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(stats.select("n_docs")))
      .select(col("tok"),
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) /
          (col("df") + 0.5)).as("idf"))
    tf.join(broadcast(idf), "tok")
      .join(dl, "id")
      .crossJoin(broadcast(stats.select("avgdl")))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") /
            col("avgdl"))))
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_matched"),
        round(sum(col("contrib")), 4).as("score"))
      .withColumnRenamed("id", idCol)
  }

  /** Reciprocal-rank fusion (Cormack et al.): merge ranked lists from
    * heterogeneous retrievers — lexical BM25, embedding ANN, anything
    * that emits (id, rank) — into one ranking by
    * `score(d) = Σ_lists 1/(k0 + rank_list(d))`, the standard hybrid-
    * retrieval combiner (scores from different retrievers are not
    * comparable; ranks are). Output: `(<idCol>, rrf_score, n_lists,
    * best_rank)`, `rrf_score` rounded to 6.
    *
    * Each input must carry one row per id with a 1-based `rankCol`.
    * Determinism note: with two lists the fused sum is a single
    * floating add (commutative bitwise); for 3+ lists the reciprocals
    * are summed in rank order (`sort_array` on the collected list) so
    * the result never depends on shuffle arrival order.
    *
    * Scale posture: candidate lists are top-k per retriever — k·lists
    * rows total, NOT corpus-sized — so the fusion is a union + one
    * hash aggregation on the id; at 100 TB all the weight stays in the
    * upstream retrievers.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 1, "k0 must be positive (RRF denominator offset)")
    val tagged = rankings.map(_.select(col(idCol).as("id"),
      col(rankCol).cast("long").as("rank")))
    val all = tagged.reduce(_ unionByName _)
    all.groupBy("id")
      .agg(
        // fixed-order fold over the collected ranks: reciprocals are
        // added smallest-rank-first regardless of partition arrival
        round(aggregate(sort_array(collect_list(col("rank"))),
          lit(0.0), (acc, r) => acc + lit(1.0) / (lit(k0.toDouble) + r)),
          6).as("rrf_score"),
        count(lit(1)).as("n_lists"),
        min(col("rank")).as("best_rank"))
      .withColumnRenamed("id", idCol)
  }
}
