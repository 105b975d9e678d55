package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StructField, StructType}

/** Native Catalyst expression: symmetric int8 quantization statistics
  * of a numeric array in ONE pass — `struct(qscale, mse)` where
  * `qscale = max|x|/127` and `mse` is the reconstruction error of the
  * explicit-floor codes `floor(x/qscale + 0.5)`:
  * `Σ (x − floor(x/qscale+0.5)·qscale)² / n`, accumulated left to
  * right so the value is bit-identical to the DuckDB oracle's
  * `list_sum(list_transform(...))/len(e)` and to the lambda
  * formulation. Degenerate inputs quantize to `(0, 0)` (all-zero or
  * empty vector); a null array — or a null ELEMENT, matching
  * [[DotProduct]]'s corrupt-data posture — yields null.
  *
  * Exists because the lambda formulation is quadratic in practice:
  * higher-order functions are interpreted AND Catalyst's
  * CollapseProject inlines the `max|x|` subexpression into the
  * per-element lambda body (expression trees are not DAGs), so a
  * 64-dim vector recomputed its own max 64 times. This expression is
  * a two-scan primitive loop inside whole-stage codegen — on the
  * embedding corpus it replaced a 4.7 s query with a sub-second scan.
  */
case class QuantStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_quant_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("qscale", DoubleType, nullable = false),
    StructField("mse", DoubleType, nullable = false)))

  private def containsNullElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullable: Boolean = child.nullable || containsNullElems

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val f = isFloat
    var m = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      val ax = if (x < 0) -x else x
      if (ax > m) m = ax
      i += 1
    }
    if (n == 0 || m == 0.0)
      return new GenericInternalRow(Array[Any](0.0, 0.0))
    val s = m / 127.0
    var acc = 0.0
    i = 0
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      val d = x - math.floor(x / s + 0.5) * s
      acc += d * d
      i += 1
    }
    new GenericInternalRow(Array[Any](s, acc / n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, av => {
      // fresh names: nullSafeCodeGen inlines this block unbraced for a
      // non-nullable child, so fixed locals would collide between two
      // instances in one generated method
      val n = ctx.freshName("qsN")
      val m = ctx.freshName("qsMax")
      val i = ctx.freshName("qsI")
      val x = ctx.freshName("qsX")
      val s = ctx.freshName("qsScale")
      val acc = ctx.freshName("qsAcc")
      val d = ctx.freshName("qsD")
      val done = ctx.freshName("qsDone")
      val get =
        if (isFloat) s"(double) $av.getFloat($i)" else s"$av.getDouble($i)"
      val nullBreak =
        if (containsNullElems)
          s"if ($av.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val row = classOf[GenericInternalRow].getName
      s"""
         |int $n = $av.numElements();
         |double $m = 0.0;
         |boolean $done = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullBreak
         |  double $x = $get;
         |  if ($x < 0) $x = -$x;
         |  if ($x > $m) $m = $x;
         |}
         |if (${ev.isNull} || $n == 0 || $m == 0.0) {
         |  ${ev.value} = new $row(new Object[]{
         |    Double.valueOf(0.0), Double.valueOf(0.0)});
         |  $done = true;
         |}
         |if (!$done) {
         |  double $s = $m / 127.0;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $get;
         |    double $d = $x - Math.floor($x / $s + 0.5) * $s;
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = new $row(new Object[]{
         |    Double.valueOf($s), Double.valueOf($acc / $n)});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
