package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `hash60(str, seed)`: the house 60-bit
  * md5-derived hash — bit-identical to the declarative form
  * `conv(substring(md5(concat(lit(s"$seed:"), c)), 1, 15), 16, 10)
  * .cast("long")` that [[TextFunctions.hash64]] used through round 17,
  * and to the oracle's `CAST(('0x' || substr(md5('seed:' || x), 1, 15))
  * AS BIGINT)` ([[TextFunctions.hash64Sql]], which stays the DuckDB
  * rendering).
  *
  * Why native (optimization r18, guide §4 "prefer built-ins / compiled
  * expressions in the hot path"): the declarative chain evaluates FIVE
  * expression nodes per call — a string concat, md5 (which materializes a
  * 32-char hex STRING), substring, `conv` (a per-char string base-conversion
  * parse), and a string→long cast — and the hash runs per token occurrence
  * in the embedder (q139 ×2), DSIR (q101), the NB classifier (q102), the
  * rolling fingerprint (q64), per gram in q156, and per line in the
  * q142/q152/q158/q162 tier. This expression computes the identical value
  * in one compiled call: one MessageDigest update over the seed-prefix
  * bytes + the UTF-8 payload, then the first 15 hex nibbles of the digest
  * read directly as a long (no hex string, no substring, no conv, no cast).
  * The md5 arithmetic itself is unchanged, so every persisted value and
  * every DuckDB replay is untouched (ExpressionSpec pins hash60 ==
  * declarative form property-style).
  */
case class Hash60Expression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60 requires (string, int), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(s: Any, seed: Any): Any =
    Hash60Expression.hash60(s.asInstanceOf[UTF8String], seed.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, seed) =>
      s"graft.functions.Hash60Expression.hash60($s, $seed)")

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Hash60Expression =
    copy(left = newLeft, right = newRight)
}

object Hash60Expression {

  // One MessageDigest per thread, reset per call — getInstance("MD5") per
  // row would dominate the digest itself on short tokens.
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // The "<seed>:" prefix bytes, cached per seed (the engine uses a handful
  // of small constant seeds).
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()
  private def prefix(seed: Int): Array[Byte] = {
    val hit = prefixCache.get(seed)
    if (hit != null) hit
    else {
      val b = (seed.toString + ":")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      prefixCache.putIfAbsent(seed, b)
      b
    }
  }

  /** Static kernel shared by eval and generated code: md5("<seed>:" ++ s),
    * first 15 hex nibbles as an unsigned 60-bit long (always ≥ 0). Nibble
    * k of the hex rendering is the high/low half of digest byte k/2, so
    * the value is bytes 0..6 big-endian shifted left 4, plus byte 7's high
    * nibble — exactly what `conv(substring(hex, 1, 15), 16, 10)` parses.
    */
  def hash60(s: UTF8String, seed: Int): Long = {
    val md = mdLocal.get()
    md.reset()
    md.update(prefix(seed))
    md.update(s.getBytes)
    val d = md.digest()
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) | ((d(2) & 0xffL) << 36) |
      ((d(3) & 0xffL) << 28) | ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
  }

  private[functions] def functionDescription = (
    new FunctionIdentifier("hash60"),
    new ExpressionInfo(classOf[Hash60Expression].getName, "hash60"),
    (children: Seq[Expression]) => Hash60Expression(children(0), children(1)): Expression)

  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = functionDescription
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
