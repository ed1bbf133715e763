package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `line_structs(text, lineTokens)`: the LINE
  * GEOMETRY (TextQueries.lineArrays — newline-split lines where `\n`
  * exists, LineTokens-token windows otherwise) pre-joined for the line
  * tier, one struct per line:
  *
  *   array<struct<ls: string, ntk: int>>
  *     ls  = the line's tokens joined by a single space
  *           ≡ concat_ws(' ', lt)   (what docLines hashes)
  *     ntk = the line's token count ≡ size(lt)
  *
  * Value-identical BY CONSTRUCTION to mapping the declarative
  * [[graft.queries.TextQueries.lineArrays]] through
  * `transform(lns, l -> struct(concat_ws(' ', l), size(l)))` — the spec
  * property-pins exactly that over adversarial inputs — but compiled: the
  * declarative form is a nested interpreted HOF chain (transform+filter+
  * split per line, slice per window) that allocates an ArrayData per line
  * plus re-joins every line downstream; this is one pass over the text
  * with precompiled regex splitting. Measured r19 at sf10: the lineArrays
  * pass alone was 3.4 s and docLines 6.5 s — ≈ ALL of q158 and most of
  * q142/q152/q162 and the streaming line twin.
  *
  * Exactness notes (each mirrored from the declarative operators and
  * pinned by the spec):
  *   - `split(text, "\n")` / `split(trim(line), "\\s+")` carry Spark's
  *     limit = -1 (trailing empty strings KEPT);
  *   - Spark `trim` strips ASCII space (0x20) ONLY — tabs/CR survive and
  *     become split artifacts exactly as in the declarative form;
  *   - the newline branch drops "" tokens and empty lines; the window
  *     branch keeps "" tokens (the declarative asymmetry, preserved);
  *   - Java's split returns [""] on empty input, so a blank doc still
  *     yields one window line with ls = "" and ntk = 1.
  */
case class LineStructsExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LineStructsExpression.OutType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"line_structs requires (string, int), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(text: Any, l: Any): Any =
    LineStructsExpression.lines(
      text.asInstanceOf[UTF8String], l.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, l) =>
      s"graft.functions.LineStructsExpression.lines($t, $l)")

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): LineStructsExpression =
    copy(left = newLeft, right = newRight)
}

object LineStructsExpression {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("ls", StringType, nullable = false),
    StructField("ntk", IntegerType, nullable = false))),
    containsNull = false)

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Spark's `trim`: leading/trailing ASCII space (0x20) only. */
  private def sparkTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  private def struct(ls: String, ntk: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(ls), ntk))

  /** Static kernel shared by eval and generated code. */
  def lines(text: UTF8String, l: Int): ArrayData = {
    val s = text.toString
    if (s.indexOf('\n') >= 0) {
      // newline branch: real lines, "" tokens dropped, empty lines dropped
      val rawLines = s.split("\n", -1) // literal single-char fast path
      val out = new java.util.ArrayList[Any](rawLines.length)
      var i = 0
      while (i < rawLines.length) {
        val toks = Ws.split(sparkTrim(rawLines(i)), -1)
        var n = 0
        var j = 0
        while (j < toks.length) { if (toks(j).nonEmpty) n += 1; j += 1 }
        if (n > 0) {
          val sb = new java.lang.StringBuilder()
          var first = true
          j = 0
          while (j < toks.length) {
            if (toks(j).nonEmpty) {
              if (!first) sb.append(' ')
              sb.append(toks(j))
              first = false
            }
            j += 1
          }
          out.add(struct(sb.toString, n))
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    } else {
      // window branch: LineTokens-token windows, "" tokens KEPT
      val toks = Ws.split(sparkTrim(s), -1)
      val n = toks.length
      val nWin = math.max(1, ((n + l - 1) / l))
      val out = new Array[Any](nWin)
      var w = 0
      while (w < nWin) {
        val from = w * l
        val until = math.min(n, from + l)
        val sb = new java.lang.StringBuilder()
        var j = from
        while (j < until) {
          if (j > from) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        out(w) = struct(sb.toString, math.max(0, until - from))
        w += 1
      }
      new GenericArrayData(out)
    }
  }

  private[functions] def functionDescription = (
    new FunctionIdentifier("line_structs"),
    new ExpressionInfo(classOf[LineStructsExpression].getName, "line_structs"),
    (children: Seq[Expression]) => LineStructsExpression(children(0), children(1)): Expression)

  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = functionDescription
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
