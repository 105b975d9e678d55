package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.words

/** Sliding-window document chunking — the segmentation step in front of
  * every RAG index and context-window-bounded training pipeline: each
  * document becomes overlapping word-window chunks of `size` words
  * advancing by `stride` (overlap = size − stride), so no passage is
  * ever split across a boundary without also appearing whole in a
  * neighbor.
  *
  * Scale posture: entirely map-only — the word array, chunk count,
  * per-chunk slice, and fingerprint are all produced inside the scan
  * projection (codegen'd built-ins, no UDF); the explode fans each
  * document out to `1 + ceil(max(words − size, 0)/stride)` rows with
  * zero shuffle. Chunk rows inherit the input's partitioning, so a
  * downstream per-chunk embed/index stage starts co-located.
  */
object Chunks {

  /** Chunk rows `(<idCol>, chunk_idx, n_words, chunk_fp)`: `chunk_idx`
    * is 0-based, `n_words` the actual words in the (tail-clamped)
    * chunk, `chunk_fp` the md5 of the space-rejoined chunk text. Every
    * non-null document yields at least one chunk (an empty/whitespace
    * text splits to the single empty token, matching the engine-shared
    * split semantics); null text yields no rows.
    */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
                    size: Int, stride: Int): DataFrame = {
    require(size >= 1, "chunk size must be positive")
    require(stride >= 1 && stride <= size,
      "stride must be in [1, size] — a stride beyond size would drop words")
    val ws = words(col(textCol))
    val n = org.apache.spark.sql.functions.size(ws)
    // 1 + ceil(max(n - size, 0)/stride), in exact double arithmetic
    // (word counts are far below 2^52)
    val nChunks = (lit(1) + floor(
      (greatest(n - size, lit(0)) + lit(stride - 1)).cast("double")
        / lit(stride.toDouble))).cast("int")
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol), ws.as("ws"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("ws"), col("chunk_idx") * stride + 1, lit(size)).as("cw"))
      .select(col(idCol), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("cw")).as("n_words"),
        md5(array_join(col("cw"), " ")).as("chunk_fp"))
  }
}
