package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns.
  *
  * The portable baseline (`aggregate(zip_with(...))`) is semantically
  * identical but runs as an interpreted higher-order function — at
  * ~100M pairs it dominates query time. This expression participates in
  * whole-stage codegen: one fused primitive loop per pair, no lambda
  * dispatch, no per-element boxing.
  *
  * Numeric contract (what makes the DuckDB oracle exact): each float is
  * widened to double *before* the multiply, and products accumulate
  * left-to-right from +0.0 — the same op order as Spark's `aggregate`
  * fold and DuckDB's `list_sum(list_transform(...))`, so all three
  * produce bit-identical doubles.
  *
  * Null contract: null array → null; array *elements* are assumed
  * non-null (embedding columns), mismatched lengths use the shorter.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var k = 0
    while (k < n) {
      acc += x.getFloat(k).toDouble * y.getFloat(k).toDouble
      k += 1
    }
    acc
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $k = 0; $k < $n; $k++) {
         |  $acc += (double)$a.getFloat($k) * (double)$b.getFloat($k);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Register `vec_dot` on the session (idempotent). Called from
    * [[graft.GraftSession]]; query builders also call it defensively so
    * they work on any externally-built session.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", args => FloatDot(args(0), args(1)), "built-in")
}
