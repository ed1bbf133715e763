package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `char_pairs(word)`: the sliding 2-character
  * substrings of a string — value-identical to
  * `transform(sequence(1, length(w)-1), i -> substr(w, i, 2))` (q111's BPE
  * pair kernel; `substr` counts CHARACTERS, mirrored here via the same
  * `UTF8String.substringSQL`) but compiled instead of an interpreted
  * transform with a fresh expression-tree eval per position. [] below 2
  * characters (callers filter `length(w) >= 2` anyway, matching the
  * sequence guard).
  *
  * ExpressionSpec property-pins equality with the declarative form over
  * adversarial words (unicode multi-byte chars, supplementary planes,
  * repeats, 2-char minimum).
  */
case class CharPairsExpression(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_pairs requires string, got ${child.dataType.sql}")

  override protected def nullSafeEval(w: Any): Any =
    CharPairsExpression.pairs(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w =>
      s"graft.functions.CharPairsExpression.pairs($w)")

  override protected def withNewChildInternal(
    newChild: Expression): CharPairsExpression = copy(child = newChild)
}

object CharPairsExpression {

  /** Static kernel shared by eval and generated code — `substringSQL` is
    * exactly the built-in `substr`'s character arithmetic.
    */
  def pairs(w: UTF8String): ArrayData = {
    val n = w.numChars()
    if (n < 2)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 1
    while (i < n) {
      out(i - 1) = w.substringSQL(i, 2)
      i += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def functionDescription = (
    new FunctionIdentifier("char_pairs"),
    new ExpressionInfo(classOf[CharPairsExpression].getName, "char_pairs"),
    (children: Seq[Expression]) => CharPairsExpression(children.head): Expression)

  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = functionDescription
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
