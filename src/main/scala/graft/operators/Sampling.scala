package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, hash-based sampling and dataset splitting — the
  * reproducibility-critical primitives of a training-data pipeline.
  *
  * Spark's native `sample`/`sampleBy` draw from a per-partition RNG:
  * results change with partitioning, cluster size, and engine — a
  * training set that cannot be reproduced or audited. These operators
  * instead assign every row a bucket that is a PURE FUNCTION of
  * (salt, id): `md5(salt ‖ id)` reduced to 60 bits, mod the bucket
  * count. Same row, same salt → same bucket on any cluster, any
  * partitioning, any engine (the arithmetic mirrors exactly in DuckDB,
  * so splits are value-oracle-checkable); changing the salt draws an
  * independent split. Everything is built-in codegen'd expressions —
  * the assignment adds one md5 per row inside the scan projection, no
  * shuffle.
  */
object Sampling {

  /** Stable bucket in [0, buckets) for an id under a salt — the
    * engine's ONE cross-engine 60-bit md5 kernel
    * ([[graft.functions.TextFunctions.token60]]) applied to
    * `salt ‖ id`, mod the bucket count. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column = {
    require(buckets >= 1,
      "buckets must be >= 1: pmod by zero is null in Spark and would " +
        "silently drop every row from downstream bucket filters")
    pmod(
      graft.functions.TextFunctions.token60(
        concat(lit(salt), id.cast("string"))),
      lit(buckets.toLong))
  }

  /** Keep a deterministic ~`pct`% of rows (bucket < pct of 100). */
  def hashSample(df: DataFrame, idCol: String, salt: String,
                 pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct must be in [0, 100]")
    df.filter(hashBucket(col(idCol), salt, 100) < pct)
  }

  /** Train/val/test assignment by bucket ranges out of 100:
    * `[0, trainPct)` → train, `[trainPct, trainPct+valPct)` → val,
    * rest → test. Disjoint and exhaustive by construction.
    */
  def split(df: DataFrame, idCol: String, salt: String,
            trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "train/val percentages must be non-negative and sum to <= 100")
    val b = hashBucket(col(idCol), salt, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
