package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The scalar kernel, kept as a plain object so whole-stage codegen
  * can call it through the static forwarder
  * (`graft.functions.expressions.JaroWinklerImpl.compute(a, b)`) —
  * same pattern as Spark's own `Levenshtein`, which calls a
  * `UTF8String` method from generated code. One tight primitive
  * method beats inlining ~40 lines of Java into every generated
  * class (and keeps eval and codegen the SAME code path).
  */
object JaroWinklerImpl {

  /** Jaro–Winkler similarity with the rapidfuzz/DuckDB conventions
    * (matching `jaro_winkler_similarity` bit-for-bit on BMP text):
    * prefix bonus (≤4 chars, weight 0.1) applies only when jaro >
    * 0.7, and ANY empty input — including both empty — scores 0.
    */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val mw = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - mw)
      val hi = math.min(l2 - 1, i + mw)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - half) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (l < maxP && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** Native codegen'd Jaro–Winkler similarity — the record-linkage
  * metric the fuzzy-join family needs above edit distance:
  * [[graft.operators.Fuzzy]]'s SymSpell join is exact for distance
  * ≤ 1 and sorted-neighborhood reaches 2, but "Cathrine/Catherine vs
  * Katherine" ranking needs a graded similarity that weights shared
  * prefixes — the Winkler boost — not a raised edit-distance cap.
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (the rapidfuzz
  * lineage) exactly — verified conventions: empty-vs-anything AND
  * empty-vs-empty score 0, prefix bonus only above jaro 0.7 (strict).
  * Operates on UTF-16 code units (= code points on BMP text; the
  * cross-engine contract is only exercised on ASCII corpora, same
  * caveat as the q59 family).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs, " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.JaroWinklerImpl.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
