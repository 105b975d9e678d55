package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact order statistics at corpus scale by iterative range
  * narrowing — the classic MapReduce median algorithm, and the
  * third iterate-scan-reduce-update workload next to
  * [[IterativeTrainer]] and [[Logistic]]: a global sort of 100 TB to
  * read one rank is absurd, so each round instead histograms the
  * current candidate range into `bins` equal sub-ranges (ONE
  * aggregation whose shuffled state is `bins` longs), the driver
  * walks the tiny histogram to find the sub-range holding the target
  * rank, and the next round recurses into it. The candidate set
  * shrinks ~`bins`× per round; once it fits `cutoff`, one small
  * ordered-limit finishes exactly.
  *
  * The scan cost per round is a filtered pass over the cached value
  * projection (min/max pruning applies on disk formats); total rounds
  * ≤ log_bins(range/ulp) ≈ a handful in practice.
  */
object OrderStat {

  /** The exact k-th smallest (1-based) value of `valCol` (nulls
    * ignored). Duplicate-heavy inputs are handled: a range that
    * collapses to a single representable double IS the answer.
    */
  def kthSmallest(df: DataFrame, valCol: String, k: Long,
                  bins: Int = 64, cutoff: Long = 4096): Double = {
    val vals = project(df, valCol)
    try {
      val n = vals.count()
      require(k >= 1 && k <= n, s"k=$k outside 1..$n")
      solve(vals, k, bins, cutoff)
    } finally { vals.unpersist() }
  }

  /** Several exact order statistics over ONE cached value projection:
    * `(n, values)` where `values(i)` is the `ks(i)`-th smallest (the
    * per-k range narrowing re-scans the shared cache, never the
    * source). The multi-quantile entry point for queries that bin on
    * a boundary set — replaces a single-group exact `percentile`,
    * whose aggregation buffer holds the whole group's value multiset:
    * at corpus scale that buffer is an executor-killer, while each
    * narrowing round here shuffles `bins` longs no matter the data
    * size. `ks` entries are resolved AFTER `n` is known via
    * `k = max(1, ceil(q * n))` by [[quantileRanks]].
    */
  def kthSmallests(df: DataFrame, valCol: String,
                   ks: Long => Seq[Long], bins: Int = 64,
                   cutoff: Long = 4096): (Long, Seq[Double]) = {
    val vals = project(df, valCol)
    try {
      val n = vals.count()
      val resolved = ks(n)
      require(resolved.forall(k => k >= 1 && k <= n),
        s"some rank outside 1..$n: $resolved")
      (n, resolved.map(k => solve(vals, k, bins, cutoff)))
    } finally { vals.unpersist() }
  }

  /** The shared rank convention for quantile boundaries: the q-th
    * quantile of n values is the `max(1, ceil(q*n))`-th smallest —
    * replayable in ANY engine as `row_number() ORDER BY v` at that
    * rank, with no interpolation arithmetic to align. */
  def quantileRanks(qs: Seq[Double])(n: Long): Seq[Long] =
    qs.map(q => math.max(1L, math.ceil(q * n).toLong))

  /** `(n, k, value)` for the lower median (`k = (n+1)/2`). */
  def lowerMedian(df: DataFrame, valCol: String, bins: Int = 64,
                  cutoff: Long = 4096): (Long, Long, Double) = {
    val vals = project(df, valCol)
    try {
      val n = vals.count()
      require(n > 0, "empty input has no median")
      val k = (n + 1) / 2
      (n, k, solve(vals, k, bins, cutoff))
    } finally { vals.unpersist() }
  }

  private def project(df: DataFrame, valCol: String): DataFrame = {
    val x = col(valCol).cast("double")
    df.filter(x.isNotNull).select(x.as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  private def solve(vals: DataFrame, k: Long, bins: Int,
                    cutoff: Long): Double = {
    require(bins >= 2, "need at least two bins per round")
    val r0 = vals.agg(min(col("v")).as("lo"), max(col("v")).as("hi")).head()
    var lo = r0.getDouble(0)
    var hi = r0.getDouble(1)
    var kk = k
    var cur = vals
    var cnt = -1L // unknown until the first histogram
    while ((cnt < 0 || cnt > cutoff) && lo < hi) {
      val width = (hi - lo) / bins
      // range below double resolution: at most ~bins representable
      // values remain — walk their exact counts
      if (width == 0.0) return walkDistinct(cur, kk)
      val bi: Column = least(greatest(
        floor((col("v") - lit(lo)) / lit(width)), lit(0.0)),
        lit((bins - 1).toDouble)).cast("int")
      val hist = cur.groupBy(bi.as("b")).agg(count(lit(1)).as("c"))
        .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
      var cum = 0L
      var b = 0
      while (b < bins && cum + hist.getOrElse(b, 0L) < kk) {
        cum += hist.getOrElse(b, 0L); b += 1
      }
      kk -= cum
      cnt = hist.getOrElse(b, 0L)
      cur = cur.filter(bi === b)
      val nlo = lo + b * width
      hi = if (b == bins - 1) hi else math.min(hi, lo + (b + 1) * width)
      lo = nlo
    }
    if (lo >= hi) lo
    else cur.orderBy(col("v")).limit(kk.toInt).agg(max(col("v")))
      .head().getDouble(0)
  }

  /** Exact k-th among a candidate set known to span at most a few
    * distinct doubles (a collapsed range): per-value counts, driver
    * walk. */
  private def walkDistinct(cur: DataFrame, kk: Long): Double = {
    val rows = cur.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .orderBy(col("v")).collect()
    var rem = kk
    var i = 0
    while (i < rows.length && rem > rows(i).getLong(1)) {
      rem -= rows(i).getLong(1); i += 1
    }
    rows(i).getDouble(0)
  }
}
