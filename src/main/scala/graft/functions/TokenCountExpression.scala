package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `token_count(str)`: whitespace-token count
  * without materializing a token array (SURVEY.md §2.10 — the "custom
  * `Expression` beats UDF" tier).
  *
  * vs `size(split(str, '\\s+'))`: no regex engine, no `ArrayData`
  * allocation, and `doGenCode` emits a static call that stays inside the
  * WholeStageCodegen span — on a 100 TB text corpus the token-count pass
  * becomes a byte scan. Counting rule: number of maximal non-whitespace
  * (ASCII) runs — equal to `size(split(trim(s), "\\s+"))` for non-blank
  * input; blank/empty input counts 0 where the split form yields 1 (the
  * `[""]` artifact), which is the more useful semantics.
  */
case class TokenCountExpression(child: Expression)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCountExpression.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenCountExpression.countTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpression =
    copy(child = newChild)
}

object TokenCountExpression {

  /** Static helper shared by eval and generated code. */
  def countTokens(s: UTF8String): Int = {
    val bytes = s.getBytes
    var count = 0
    var inToken = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      // ASCII whitespace: space, \t, \n, \x0b, \f, \r — multi-byte UTF-8
      // continuation bytes are negative, never whitespace.
      val ws = b == 0x20 || (b >= 0x09 && b <= 0x0d)
      if (!ws && !inToken) count += 1
      inToken = !ws
      i += 1
    }
    count
  }

  private[functions] def functionDescription = (
    new FunctionIdentifier("token_count"),
    new ExpressionInfo(classOf[TokenCountExpression].getName, "token_count"),
    (children: Seq[Expression]) => TokenCountExpression(children.head): Expression)

  /** Register on an existing session (tests / library users without
    * extension config).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      functionDescription._1, functionDescription._2, functionDescription._3)
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` — the
  * SparkSessionExtensions hook (SURVEY.md §7 / builder brief custom-operator
  * tier (c)): config-time injection of EVERY native graft expression, so a
  * cluster user gets the full SQL surface (`token_count`, `vec_dot`,
  * `word_shingles`) with zero library calls. The per-expression
  * `register(spark)` helpers install the SAME descriptions at runtime —
  * one list, two install paths (ExpressionSpec pins the equivalence).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** Every native expression's (identifier, info, builder) triple — the
    * single source for both install paths.
    */
  def injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(TokenCountExpression.functionDescription,
      DotProductExpression.functionDescription,
      WordShinglesExpression.functionDescription,
      Hash60Expression.functionDescription,
      WordBigramsExpression.functionDescription,
      LineStructsExpression.functionDescription,
      CharPairsExpression.functionDescription)

  /** Install everything on an existing session (the runtime twin of the
    * `spark.sql.extensions` config path).
    */
  def registerAll(spark: SparkSession): Unit = {
    TokenCountExpression.register(spark)
    DotProductExpression.register(spark)
    WordShinglesExpression.register(spark)
    Hash60Expression.register(spark)
    WordBigramsExpression.register(spark)
    LineStructsExpression.register(spark)
    CharPairsExpression.register(spark)
  }
}
