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

  /** Deterministic weighted source mixing — the "data mixture" step of
    * a training pipeline: each source is downsampled to its target
    * percentage (`weights`, with `defaultPct` for unlisted sources) by
    * the same pure hash rule as [[hashSample]], salted per source so
    * the per-source draws are independent. Adds a boolean `kept`
    * column rather than filtering, so mixture audits (kept vs total per
    * source) stay one scan. No shuffle — one md5 per row in the scan
    * projection.
    */
  def mixSources(df: DataFrame, idCol: String, sourceCol: String,
                 weights: Map[String, Int], defaultPct: Int,
                 salt: String = "mix"): DataFrame = {
    (weights.values.toSeq :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"source pct must be in [0, 100]"))
    // null-safe: a null source falls through to defaultPct and a null
    // id hashes as "" — `kept` is never null (a null would silently
    // vanish from BOTH kept and rejected audit filters)
    val src = coalesce(col(sourceCol).cast("string"), lit(""))
    val idStr = coalesce(col(idCol).cast("string"), lit(""))
    val b = pmod(
      graft.functions.TextFunctions.token60(
        concat(lit(salt), lit("|"), src, lit("|"), idStr)),
      lit(100L))
    val pct = weights.foldLeft(lit(defaultPct)) { case (acc, (srcName, p)) =>
      when(src === srcName, p).otherwise(acc)
    }
    df.withColumn("kept", b < pct)
  }

  /** Stratified per-group cap: keep at most `cap` rows per group,
    * chosen by deterministic hash order (NOT arrival order, which is
    * partition-layout-dependent). The workhorse for bounding dominant
    * sources/languages in a mixture. One shuffle on the group key; the
    * rank is a windowed `row_number` ordered by the 60-bit hash with
    * the id as an unconditional tie-break, so the selection is a pure
    * function of (salt, ids) — reproducible on any cluster.
    */
  def stratifiedCap(df: DataFrame, idCol: String, groupCol: String,
                    cap: Int, salt: String = "strat"): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(hashBucket(col(idCol), salt, 1000000).asc, col(idCol).asc)
    df.withColumn("strat_rank", row_number().over(w))
      .filter(col("strat_rank") <= cap)
      .drop("strat_rank")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis A-ES): each row gets the key `u^(1/w)` for a
    * hash-derived uniform `u ∈ (0,1)` and weight `w`; the top-k keys
    * are a weighted sample — rows with twice the weight are twice as
    * likely to make the cut, yet the draw is a pure function of
    * (salt, id, weight), reproducible on any cluster or engine. The
    * returned `es_key` is the monotone transform `ln(u)/w` (same
    * ordering, no pow): u comes from the shared 60-bit kernel as
    * `(token60(salt ‖ id) + 1) / (2^60 + 1)`, strictly inside (0,1) so
    * the log is finite.
    *
    * Scale posture: the key is one md5 inside the scan projection;
    * top-k is `orderBy().limit()` — Catalyst plans
    * `TakeOrderedAndProject`, a per-partition bounded heap + driver
    * merge of k·partitions rows, never a global sort. Rows with null,
    * zero, or negative weight are excluded (they have no place in the
    * weighted order).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = "es"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val denom = math.pow(2.0, 60) + 1.0
    val u = (graft.functions.TextFunctions.token60(
      concat(lit(salt), col(idCol).cast("string"))).cast("double") + 1.0) /
      denom
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Train/val/test assignment by bucket ranges out of 100:
    * `[0, trainPct)` → train, `[trainPct, trainPct+valPct)` → val,
    * rest → test. Disjoint and exhaustive by construction.
    */
  /** Temperature-scaled source mixture weights — the allocation
    * POLICY half of data mixing ([[mixSources]] executes a given mix):
    * each source's sampling weight is `n_tokens^alpha` normalized
    * (alpha = 1 reproduces natural proportions, alpha = 0 uniform;
    * 0 < alpha < 1 up-weights small high-value sources, the standard
    * multilingual/multi-corpus temperature trick), with the token
    * `budget` allocated pro rata and the implied epochs-per-source
    * (allocation ÷ corpus size — the over-sampling multiplier small
    * sources will be repeated by).
    *
    * One grouped aggregation over the corpus; everything after runs on
    * the k-row source table. Determinism: the power-scaled weight is
    * quantized to a 2^24-scaled long before the normalizing sum, so
    * the k-term sum is order-independent and exact cross-engine.
    *
    * Returns `(source, n_docs, n_tokens, weight, alloc_tokens,
    * epochs)`.
    */
  def mixtureWeights(docs: DataFrame, sourceCol: String, textCol: String,
                     alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha in [0,1]")
    require(budget > 0, "budget must be positive")
    val scale = (1L << 24).toDouble
    val per = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextFunctions.words(col(textCol)))
          .cast("long")).as("n_tokens"))
    val t = per.withColumn("wq",
      graft.functions.Rounding.roundTo(
        pow(col("n_tokens").cast("double"), lit(alpha)) * scale, 0)
        .cast("long"))
    val share = col("wq").cast("double") / col("twq").cast("double")
    t.crossJoin(broadcast(t.agg(sum("wq").as("twq"))))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        graft.functions.Rounding.roundTo(share, 6).as("weight"),
        floor(share * lit(budget.toDouble)).as("alloc_tokens"),
        graft.functions.Rounding.roundTo(
          share * lit(budget.toDouble) / col("n_tokens").cast("double"), 4)
          .as("epochs"))
  }

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
