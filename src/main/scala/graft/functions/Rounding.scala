package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine deterministic rounding.
  *
  * Spark's `round` converts the double to its SHORTEST decimal
  * representation (BigDecimal.valueOf) before HALF_UP rounding, so a
  * binary value like 0.66474999…95 whose shortest repr is "0.66475"
  * rounds UP to 0.6648 — while DuckDB's round works on the binary
  * double (≈ std::round(x·10ⁿ)/10ⁿ) and yields 0.6647. Any
  * oracle-compared rounded double can hit this.
  *
  * `floor(x·10ⁿ + 0.5)/10ⁿ` computed on doubles reproduces DuckDB's
  * behavior exactly for the positive ranges our queries emit, and is
  * identical in both engines when the unrounded inputs are identical.
  */
object Rounding {
  def roundTo(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Driver-side scalar equivalent (for weights computed in Scala). */
  def roundTo(x: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    math.floor(x * p + 0.5) / p
  }
}
