package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling for pipeline gates (the step before any
  * 100 TB ingest is allowed to proceed): row count, per-column null
  * counts, and arbitrary named rule-violation counts — all in ONE
  * aggregation pass over the table. Rules are plain `Column`
  * predicates, so they stay codegen'd and pushdown-friendly; nothing
  * is collected but the single profile row.
  */
object Quality {

  /** One-pass profile: `n_rows`, `nulls_<col>` per requested column,
    * then one violation count per named rule (predicate TRUE = the row
    * violates). Null predicate results do not count as violations —
    * express nullability concerns via `nullCols`.
    */
  def profile(df: DataFrame, nullCols: Seq[String],
              rules: Seq[(String, Column)]): DataFrame = {
    // rule names become output columns verbatim — collisions (duplicate
    // rule names, or a rule named 'n_rows'/'nulls_<col>') would yield a
    // silently ambiguous profile row
    val reserved = Set("n_rows") ++ nullCols.map(c => s"nulls_$c")
    val names = rules.map(_._1)
    require(names.distinct.length == names.length,
      s"duplicate rule names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val clash = names.filter(reserved)
    require(clash.isEmpty,
      s"rule names collide with generated profile columns: ${clash.mkString(", ")}")
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_rows")) ++
        nullCols.map(c =>
          sum(when(col(c).isNull, 1).otherwise(0)).cast("long")
            .as(s"nulls_$c")) ++
        rules.map { case (name, pred) =>
          sum(when(pred, 1).otherwise(0)).cast("long").as(name)
        }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
