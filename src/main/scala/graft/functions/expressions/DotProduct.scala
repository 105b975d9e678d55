package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two numeric arrays with
  * per-element promotion to double (`Σ (double)a[i]·(double)b[i]`,
  * sequential — identical to the lambda formulation
  * `aggregate(zip_with(a,b,(x,y)->double(x)*double(y)),0d,+)` and to
  * DuckDB's `list_dot_product(a::DOUBLE[], b::DOUBLE[])`).
  *
  * Corrupt-data posture is STRICT: a length mismatch throws (like
  * DuckDB; a truncating dot product would turn a corrupt embedding row
  * into a plausible wrong cosine), and a null ELEMENT yields a null
  * result (exactly what the lambda formulation produces — parquet list
  * elements are nullable by default, so silently reading a null slot
  * as garbage is not an option).
  *
  * Exists because higher-order-function expressions are interpreted
  * (CodegenFallback) in Spark: on the ANN/near-dup hot paths the
  * lambda version allocates a closure frame per element, while this
  * expression participates in whole-stage codegen as a tight primitive
  * loop. Preference order per the project charter: compose built-ins →
  * custom Expression (this) → custom operator → mapPartitions.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType

  // null ELEMENTS (not just null arrays) null out the result, so
  // nullability must account for containsNull children — with
  // nullable=false codegen would hard-wire ev.isNull to "false"
  override def nullable: Boolean =
    left.nullable || right.nullable || containsNullElems

  private def containsNullElems: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    }
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: array length mismatch ($n vs ${b.numElements()})")
    val aF = elemType(left) == FloatType
    val bF = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv) => {
      // fresh names: nullSafeCodeGen inlines this block unbraced when
      // both children are non-nullable, so fixed locals would collide
      // between two DotProduct instances in one generated method
      val n = ctx.freshName("dotN")
      val acc = ctx.freshName("dotAcc")
      val i = ctx.freshName("dotI")
      def get(v: String, t: DataType): String = t match {
        case FloatType => s"(double) $v.getFloat($i)"
        case _ => s"$v.getDouble($i)"
      }
      // only emit the per-element null branch when an input can
      // actually hold null slots — fixed-width float arrays keep the
      // tight two-op loop
      val nullBreak =
        if (containsNullElems)
          s"""if ($av.isNullAt($i) || $bv.isNullAt($i)) {
             |    ${ev.isNull} = true; break;
             |  }""".stripMargin
        else ""
      s"""
         |int $n = $av.numElements();
         |if ($bv.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: array length mismatch (" + $n + " vs " +
         |      $bv.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullBreak
         |  $acc += (${get(av, elemType(left))}) * (${get(bv, elemType(right))});
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  val dotName = "graft_dot"
  val rollingHashName = "graft_rolling_hash"

  val dotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$dotName takes exactly 2 arguments")
    DotProduct(exprs.head, exprs(1))
  }

  val rollingHashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$rollingHashName takes exactly 1 argument")
    RollingHash(exprs.head)
  }

  val wordShinglesName = "graft_word_shingles"
  val simhashName = "graft_simhash60"
  val quantStatsName = "graft_quant_stats"
  val jaroWinklerName = "graft_jaro_winkler"
  val nfcName = "graft_nfc"
  val boundedTopKName = "graft_bounded_topk"

  val boundedTopKBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 4,
      s"$boundedTopKName takes exactly 4 arguments (id, ord, pay, k)")
    require(exprs(3).foldable, s"$boundedTopKName requires a literal k")
    BoundedTopK(exprs.head, exprs(1), exprs(2),
      exprs(3).eval().asInstanceOf[Number].intValue())
  }

  val nfcBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$nfcName takes exactly 1 argument")
    NfcNormalize(exprs.head)
  }

  val jaroWinklerBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$jaroWinklerName takes exactly 2 arguments")
    JaroWinkler(exprs.head, exprs(1))
  }

  val quantStatsBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$quantStatsName takes exactly 1 argument")
    QuantStats(exprs.head)
  }

  val simhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$simhashName takes exactly 1 argument")
    SimHash60(exprs.head)
  }

  val wordShinglesBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"$wordShinglesName takes exactly 2 arguments (text, n)")
    require(exprs(1).foldable,
      s"$wordShinglesName requires a literal shingle size")
    WordShingleArray(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue())
  }

  private val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    dotName -> dotBuilder,
    rollingHashName -> rollingHashBuilder,
    wordShinglesName -> wordShinglesBuilder,
    simhashName -> simhashBuilder,
    quantStatsName -> quantStatsBuilder,
    jaroWinklerName -> jaroWinklerBuilder,
    nfcName -> nfcBuilder,
    boundedTopKName -> boundedTopKBuilder)

  /** Idempotent per-session registration (used by the Column API so
    * the library works without spark.sql.extensions configuration).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name))) {
        reg.createOrReplaceTempFunction(name, builder, "built-in")
      }
    }
  }
}

/** `spark.sql.extensions=graft.functions.expressions.GraftExtensions`
  * injects the engine's native functions at session build time — the
  * SparkSessionExtensions path for deployments that configure the
  * library declaratively.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.dotName),
      new ExpressionInfo(classOf[DotProduct].getName, GraftFunctions.dotName),
      GraftFunctions.dotBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.rollingHashName),
      new ExpressionInfo(classOf[RollingHash].getName,
        GraftFunctions.rollingHashName),
      GraftFunctions.rollingHashBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.wordShinglesName),
      new ExpressionInfo(classOf[WordShingleArray].getName,
        GraftFunctions.wordShinglesName),
      GraftFunctions.wordShinglesBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.simhashName),
      new ExpressionInfo(classOf[SimHash60].getName,
        GraftFunctions.simhashName),
      GraftFunctions.simhashBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.quantStatsName),
      new ExpressionInfo(classOf[QuantStats].getName,
        GraftFunctions.quantStatsName),
      GraftFunctions.quantStatsBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.jaroWinklerName),
      new ExpressionInfo(classOf[JaroWinkler].getName,
        GraftFunctions.jaroWinklerName),
      GraftFunctions.jaroWinklerBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.nfcName),
      new ExpressionInfo(classOf[NfcNormalize].getName,
        GraftFunctions.nfcName),
      GraftFunctions.nfcBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.boundedTopKName),
      new ExpressionInfo(classOf[BoundedTopK].getName,
        GraftFunctions.boundedTopKName),
      GraftFunctions.boundedTopKBuilder))
  }
}
