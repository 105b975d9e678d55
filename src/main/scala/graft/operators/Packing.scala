package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed token-budget
  * training chunks, the step that turns a filtered corpus into model
  * input batches. Semantics are the standard concat-then-chunk LLM
  * layout: documents are laid out in a deterministic order inside a
  * stream, and a document belongs to the chunk its first token falls
  * in (`chunk = start_offset / budget`).
  *
  * Scale posture: a single global stream would serialize into one
  * sorted partition — a non-starter at 100 TB. Instead the corpus is
  * split into `streams` INDEPENDENT streams by the deterministic
  * 60-bit hash of the id ([[Sampling.hashBucket]]), and the running
  * offset is a window cumsum PARTITIONED by stream: each stream sorts
  * only its own slice (fully parallel, AQE-balanceable), and chunk ids
  * are (stream, chunk) pairs. Determinism: same ids + same salt →
  * byte-identical layout on any cluster, so a training run can be
  * reproduced or resumed from the id list alone.
  */
object Packing {

  /** Per-document chunk assignment: `(id, tokens, stream, start_offset,
    * chunk)` where `start_offset` is the token offset of the document
    * inside its stream and `chunk = start_offset / budget`.
    */
  def packOffsets(df: DataFrame, idCol: String, tokens: Column,
                  budget: Long, streams: Int = 32,
                  salt: String = "pack"): DataFrame = {
    require(budget >= 1, "chunk token budget must be >= 1")
    require(streams >= 1, "need at least one packing stream")
    val stream = Sampling.hashBucket(col(idCol), salt, streams).cast("int")
    val w = Window.partitionBy("stream").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), tokens.cast("long").as("tokens"),
        stream.as("stream"))
      .withColumn("start_offset",
        sum("tokens").over(w) - col("tokens"))
      .withColumn("chunk", (col("start_offset") / budget).cast("long"))
  }
}
