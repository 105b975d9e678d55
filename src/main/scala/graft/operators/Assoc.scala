package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
// cross-engine deterministic rounding shadows functions.round
import graft.functions.Rounding.{roundTo => round}

/** Association mining over basket data — pointwise mutual information,
  * the statistic under word2vec-style embeddings and every
  * "customers who bought X" feature: for items a, b co-occurring in
  * baskets, `pmi = ln(p(a,b) / (p(a)·p(b)))` with probabilities over
  * baskets. Counts alone rank ubiquitous pairs first; PMI surfaces
  * pairs that co-occur MORE than their popularity predicts.
  *
  * Scale posture: baskets collapse to distinct (basket, item) in one
  * aggregation; pair counts come from the basket-keyed self-join
  * (fan-out = basket size, the same bounded shape as the q118 edge
  * build); item marginals are item-cardinality and join small; the
  * basket total is a one-row broadcast. The min-support filter runs
  * BEFORE the marginal joins, so the rare-pair tail never joins.
  */
object Assoc {

  /** Top-`topN` item pairs by PMI among pairs co-occurring in at least
    * `minSupport` baskets: `(item_a, item_b, n_pairs, n_a, n_b, pmi)`,
    * `item_a < item_b`, ordered by (pmi desc, item_a, item_b).
    */
  def pmiPairs(baskets: DataFrame, basketCol: String, itemCol: String,
               minSupport: Long, topN: Int): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(topN >= 1, "topN must be >= 1")
    val bi = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val total = bi.agg(countDistinct(col("bk")).cast("double").as("n_bk"))
    val itemCnt = bi.groupBy(col("it")).agg(count(lit(1)).as("cnt"))
    val pairs = bi.as("x").join(bi.as("y"),
        col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
      .groupBy(col("x.it").as("item_a"), col("y.it").as("item_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minSupport)
    pairs
      .join(itemCnt.select(col("it").as("item_a"), col("cnt").as("n_a")),
        "item_a")
      .join(itemCnt.select(col("it").as("item_b"), col("cnt").as("n_b")),
        "item_b")
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_pairs"),
        col("n_a"), col("n_b"),
        round(log(col("n_pairs").cast("double") * col("n_bk") /
          (col("n_a").cast("double") * col("n_b").cast("double"))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("item_a"), col("item_b"))
      .limit(topN)
  }
}
