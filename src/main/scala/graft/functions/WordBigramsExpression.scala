package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `word_bigrams(tokens)`: the sliding
  * (non-distinct) " "-joined word bigrams of an `array<string>` column, []
  * below 2 tokens — value-identical to
  * `transform(sequence(1, size(t)-1), i -> concat_ws(' ', element_at(t, i),
  * element_at(t, i+1)))` (guarded for < 2 tokens) but compiled: the
  * higher-order-function chain is interpreted per element (HOFs have no
  * codegen) and pays two element_at probes plus an expression-tree eval per
  * position, while this is one tight loop with one concat per position —
  * the same §-custom-Expression tier as [[WordShinglesExpression]], applied
  * to the second-hottest string kernel (the bigram stream feeds the q79
  * bigram LM, q160 PMI collocations, and the q103/q108/streaming blocklist
  * screens; measured r19 at sf10, one corpus bigram pass was ~2.0 s of
  * q79's 7.7 s and runs twice in its plan).
  *
  * [[TextFunctions.bigramsHof]] is the retained declarative reference;
  * ExpressionSpec property-pins value equality over adversarial token
  * arrays (empties, unicode, single-token, repeated tokens).
  */
case class WordBigramsExpression(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_bigrams requires array<string>, got ${other.sql}")
  }

  override protected def nullSafeEval(tok: Any): Any =
    WordBigramsExpression.bigrams(tok.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.WordBigramsExpression.bigrams($t)")

  override protected def withNewChildInternal(
    newChild: Expression): WordBigramsExpression = copy(child = newChild)
}

object WordBigramsExpression {

  private val Space = UTF8String.fromString(" ")

  /** Static kernel shared by eval and generated code. */
  def bigrams(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    if (len < 2)
      return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](len - 1)
    i = 0
    while (i < len - 1) {
      out(i) = UTF8String.concatWs(Space, toks(i), toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def functionDescription = (
    new FunctionIdentifier("word_bigrams"),
    new ExpressionInfo(classOf[WordBigramsExpression].getName, "word_bigrams"),
    (children: Seq[Expression]) => WordBigramsExpression(children.head): Expression)

  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = functionDescription
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
