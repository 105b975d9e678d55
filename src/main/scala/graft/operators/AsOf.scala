package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3): for each left row, the most recent
  * right row with `right.ts <= left.ts` (ties: larger right id wins)
  * within a tolerance, per partition key.
  *
  * Implemented as union → single sort per key → running `max(struct)`
  * window, NOT as a range join: a range-predicate join plans as a
  * broadcast-nested-loop (O(|L|·|R|) per key), while this shape is one
  * shuffle on the key plus a per-partition sort — the plan that
  * survives a 100× scale-up. Right rows at the same timestamp as a
  * left row sort before it (is_left tiebreak), so they are visible,
  * matching the `right.ts <= left.ts` contract exactly.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, partitionKey: String,
               tsCol: String, idCol: String,
               toleranceUs: Long): DataFrame = {
    val l = left.select(col(partitionKey).as("pk"), col(tsCol).as("ts"),
      col(idCol).as("id"), lit(1).as("is_left"))
    val r = right.select(col(partitionKey).as("pk"), col(tsCol).as("ts"),
      col(idCol).as("id"), lit(0).as("is_left"))
    val w = Window.partitionBy("pk")
      .orderBy(col("ts"), col("is_left"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("last_right",
        max(when(col("is_left") === 0,
          struct(col("ts").as("rts"), col("id").as("rid")))).over(w))
      .filter(col("is_left") === 1 && col("last_right").isNotNull &&
        unix_micros(col("last_right.rts")) >=
          unix_micros(col("ts")) - toleranceUs)
      .select(col("pk").as(partitionKey), col("id").as("left_id"),
        col("last_right.rid").as("right_id"))
  }
}
