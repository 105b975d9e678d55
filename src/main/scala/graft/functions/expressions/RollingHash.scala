package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial rolling hash over a string:
  * `h = fold(codepoints, 0, (acc, c) -> (acc·31 + c) mod (2³¹−1))` —
  * the classic Rabin–Karp document fingerprint.
  *
  * Iterates Unicode CODE POINTS (surrogate pairs fold as one value),
  * which is exactly what the DuckDB oracle mirror computes for any
  * input — ASCII or not — since its `substr`/`ascii` are
  * code-point-based (`list_reduce(list_prepend(0,
  * list_transform(range(1, len+1), i -> ascii(substr(t,i,1)))),
  * (acc,c) -> (acc*31+c) % 2147483647)`).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def prettyName: String = "graft_rolling_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp.toLong) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // fresh names: the block is inlined unbraced for non-nullable
      // children, so fixed locals would collide between instances
      val s = ctx.freshName("rhS")
      val acc = ctx.freshName("rhAcc")
      val i = ctx.freshName("rhI")
      val cp = ctx.freshName("rhCp")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + (long) $cp) % 2147483647L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
