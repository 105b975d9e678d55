package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, floor, lit, signum}

/** Cross-engine deterministic rounding.
  *
  * Spark's `round` converts the double to its SHORTEST decimal
  * representation (BigDecimal.valueOf) before HALF_UP rounding, so a
  * binary value like 0.66474999…95 whose shortest repr is "0.66475"
  * rounds UP to 0.6648 — while DuckDB's round works on the binary
  * double (≈ std::round(x·10ⁿ)/10ⁿ) and yields 0.6647. Any
  * oracle-compared rounded double can hit this.
  *
  * `sign(x)·floor(|x|·10ⁿ + 0.5)/10ⁿ` computed on doubles reproduces
  * DuckDB's round-half-away-from-zero for BOTH signs (a bare
  * `floor(x·10ⁿ+0.5)` would round negative exact halves toward +inf).
  *
  * Caveats (identical-in-practice, not bit-identical-by-construction):
  * when `y = |x|·10ⁿ` sits within half an ulp BELOW an exact half
  * (e.g. y = 0.49999999999999994, where `y + 0.5` rounds up to 1.0 in
  * FP), `floor(y + 0.5)` rounds up while `std::round(y)` does not; and
  * Spark's `floor` yields BIGINT, so scaled magnitudes beyond ~9.2e18
  * (|x| ≳ 9.2e18 / 10ⁿ) overflow. Neither regime occurs in the
  * oracle-compared aggregates (3-4 decimal scales over bounded sums);
  * callers rounding adversarial or astronomic values should not rely
  * on exact DuckDB equality at those edges.
  */
object Rounding {
  // The trailing `+ 0.0` normalizes -0.0 → +0.0 (signum(c)·0.0 is
  // -0.0 for negative near-zero inputs, and the sign of a ~0 parallel
  // sum is reduction-order dependent — the q93/q299/q293 flake class).
  // Oracles whose rounded statistic can land on ±0.0 must carry the
  // matching `+ 0.0` (DuckDB round() keeps -0.0).
  def roundTo(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    signum(c) * (floor(abs(c) * lit(p) + lit(0.5)) / lit(p)) + lit(0.0)
  }

  /** Driver-side scalar equivalent (for weights computed in Scala). */
  def roundTo(x: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    math.signum(x) * (math.floor(math.abs(x) * p + 0.5) / p) + 0.0
  }

  /** Bare floor rounding `floor(x·10ⁿ + 0.5)/10ⁿ` — for engine sites
    * whose ORACLE spells exactly this form on a NEGATIVE-capable
    * quantity. Unlike [[roundTo]] it rounds negative exact halves
    * toward +inf (floor semantics), which is what the bare SQL form
    * does; using roundTo against such an oracle diverges whenever the
    * scaled value lands on a negative half-grid tie. For non-negative
    * values the two are bit-identical. */
  def floorRound(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
}
