package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle kernel shared by the interpreted and
  * generated code paths of [[WordShingleArray]]. A standalone object
  * (no companion class) so scalac emits static forwarders that the
  * Janino-generated code can call directly.
  */
object ShingleOps {
  private val WS: UTF8String = UTF8String.fromString("\\s+")
  private val SPACE: UTF8String = UTF8String.fromString(" ")

  /** Exactly `split(trim(text), "\\s+")` (Spark's builtin semantics:
    * ASCII-space trim, regex split with limit -1) followed by the
    * position n-gram join — one pass, no intermediate row explosion.
    * Documents with fewer than `n` words degrade to a single whole-text
    * shingle (no row dropped — deliberate contrast to the reference's
    * tail truncation, SURVEY.md §0.3).
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val w = text.trim().split(WS, -1)
    if (w.length >= n) {
      val out = new Array[Any](w.length - n + 1)
      var i = 0
      while (i + n <= w.length) {
        out(i) = UTF8String.concatWs(SPACE,
          java.util.Arrays.copyOfRange(w, i, i + n): _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(
        Array[Any](UTF8String.concatWs(SPACE, w: _*)))
    }
  }
}

/** Native word n-gram shingle expression: emits the (multiset) array of
  * word `n`-grams of a text column in ONE pass inside the scan
  * projection.
  *
  * Exists because the two alternative formulations both carry a scale
  * tax: the array-lambda version (`transform(sequence(...), slice …)`)
  * is interpreted per shingle (higher-order functions are
  * CodegenFallback in Spark), and the posexplode + `Window.lead`
  * version shuffles and sorts a corpus-sized (doc, position) table
  * before the first shingle exists. This expression produces shingles
  * with zero shuffle and participates in whole-stage codegen (one
  * static call per row); `explode` over its result is the builtin
  * codegen'd generator.
  *
  * Output order is positional (duplicates preserved): min/agg consumers
  * use it directly, set consumers add `array_distinct`/`distinct()`.
  */
case class WordShingleArray(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def prettyName: String = "graft_word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    ShingleOps.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.ShingleOps.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
