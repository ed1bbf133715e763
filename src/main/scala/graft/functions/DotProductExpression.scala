package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression `vec_dot(a, b)`: dot product of two
  * `array<double>` columns without the intermediate array that
  * `aggregate(zip_with(a, b, *), 0d, +)` materializes per row (SURVEY.md
  * §2.10 custom-`Expression` tier — this is the single hottest kernel of
  * the similarity/near-dup operators, executed once per candidate pair).
  *
  * Accumulation order is the same left-to-right loop as the zip_with fold
  * and DuckDB's list kernel, so results are bit-identical to both.
  */
case class DotProductExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType, true) ||
      left.dataType == ArrayType(DoubleType, false))
      if (right.dataType == left.dataType || right.dataType ==
        ArrayType(DoubleType, !left.dataType.asInstanceOf[ArrayType].containsNull))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("vec_dot requires two array<double> inputs")
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<double> inputs, got ${left.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpression.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductExpression.dot($a, $b)")

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): DotProductExpression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpression {

  /** Static helper shared by eval and generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  private[functions] def functionDescription = (
    new FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProductExpression].getName, "vec_dot"),
    (children: Seq[Expression]) => DotProductExpression(children(0), children(1)): Expression)

  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = functionDescription
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
