package graft

/** Central oracle-side signed-zero normalization.
  *
  * The engine normalizes −0.0 → +0.0 in EVERY rounded statistic
  * ([[graft.functions.Rounding.roundTo]] appends `+ 0.0`, and every
  * query file shadows `round` with it), because the sign of a ~0
  * parallel sum is reduction-order dependent — DuckDB flipped
  * q299/q93 between same-day runs. The oracles must carry the same
  * normalization or any statistic that deterministically rounds to
  * zero from below emits Spark `0.0` vs DuckDB `-0.0` — a repr/hash
  * mismatch with equal values.
  *
  * Rather than hand-sweeping `+ 0.0` onto ~800 per-site closers (and
  * re-introducing the class with the next query), this rewrites every
  * `round(...)` call in the oracle text to `(round(...) + 0.0)` at
  * registration time — the single central mirror of the engine-side
  * shadow. The transform is semantically the identity everywhere
  * else: `x + 0.0 = x` for all doubles except `-0.0`, wrapping parens
  * keep any following `::CAST` / `AS alias` binding unchanged, and
  * IEEE comparisons already treat ±0.0 as equal, so predicates and
  * join keys are unaffected. Single-quoted SQL strings (regex
  * patterns can contain parens) and double-quoted identifiers are
  * copied verbatim. Validated by a full 381-query DuckDB gate replay
  * at sf0.01, default AND single-threaded DuckDB (round 13).
  */
object OracleSql {

  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Rewrite every `round(` call (any nesting depth, case-insensitive,
    * word-boundary checked) to `(round(...) + 0.0)`. */
  def normalizeSignedZero(sql: String): String = {
    val n = sql.length
    val sb = new StringBuilder(n + 64)
    // paren depths at which a wrapped round( is currently open
    var open = List.empty[Int]
    var depth = 0
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        // SQL line comment: copy verbatim to end of line (comment
        // prose may contain unbalanced parens)
        while (i < n && sql.charAt(i) != '\n') { sb.append(sql.charAt(i)); i += 1 }
      } else if (c == '\'' || c == '"') {
        // copy the literal/identifier verbatim; '' / "" escape by doubling
        sb.append(c); i += 1
        var done = false
        while (i < n && !done) {
          sb.append(sql.charAt(i))
          if (sql.charAt(i) == c) {
            if (i + 1 < n && sql.charAt(i + 1) == c) { sb.append(c); i += 1 }
            else done = true
          }
          i += 1
        }
      } else if ((i == 0 || !isIdentChar(sql.charAt(i - 1))) &&
          sql.regionMatches(true, i, "round(", 0, 6)) {
        sb.append('(').append(sql.substring(i, i + 6))
        depth += 1
        open ::= depth
        i += 6
      } else if (c == '(') {
        depth += 1; sb.append(c); i += 1
      } else if (c == ')') {
        if (open.headOption.contains(depth)) {
          sb.append(") + 0.0)")
          open = open.tail
        } else sb.append(c)
        depth -= 1; i += 1
      } else {
        sb.append(c); i += 1
      }
    }
    require(depth == 0 && open.isEmpty,
      s"unbalanced parentheses while normalizing oracle SQL: $sql")
    sb.toString
  }
}
