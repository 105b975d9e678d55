package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins (SURVEY.md §2.3 scale
  * notes). AQE's skew-join split handles most cases at runtime; this
  * explicit salt is for the pathological key whose rows exceed what one
  * task can hold even after AQE splitting (e.g. a null-like sentinel
  * key joined against a dimension).
  *
  * The skewed (fact) side gets a deterministic salt derived from the
  * whole row; the dimension side is replicated across all
  * `saltFactor` salt values, so `(key, salt)` spreads one hot key over
  * `saltFactor` reducers. Join results are identical to the unsalted
  * join; only the partitioning changes. Replication multiplies the
  * dimension shuffle by `saltFactor` — use for genuinely small/medium
  * dims (a broadcast join is better when the dim fits in memory).
  */
object Skew {

  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltOf: Column =
      pmod(hash(struct(facts.columns.map(col): _*)), lit(saltFactor))
    val l = facts.withColumn("__graft_salt", saltOf)
    val r = dim.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, l("__graft_salt") === r("__graft_salt") &&
        l(key) === r(key))
      .drop("__graft_salt")
  }
}
