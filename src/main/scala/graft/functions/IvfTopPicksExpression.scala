package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression `ivf_top_picks(v, vv, cents, nPicks)`: the
  * group-RESTRICTED argmin of q129's two-level IVF — for one vector `v`
  * (with its precomputed self-dot `vv`) against one coarse group's folded
  * centroid array `cents` (array of struct<c_id:long, cv:array<double>,
  * cc:double>), return the `nPicks` nearest centroids as
  * array<struct<rd2:double, c_id:long>> ranked by (HALF_UP-6dp squared
  * distance, c_id).
  *
  * Why native (r17 — the measured q129 lever): the previous
  * `slice(array_sort(transform(cents, c => struct(round(vv − 2·vec_dot(v,
  * c.cv) + c.cc, 6), c.c_id))), 1, n)` form evaluates the lambda
  * INTERPRETED once per (vector, centroid) — n·CoarseProbes·K/G ≈ n·√K
  * struct allocations and dispatch frames per pass, measured as ~70% of
  * q129's sf10 wall (8.7 s of 12.5 s across the two ivf2TopPicks passes).
  * This expression runs the identical arithmetic as one compiled loop per
  * row: left-to-right dots (the `vec_dot` contract), d2 = vv − 2·dp + cc
  * evaluated in the same association order, the same BigDecimal HALF_UP
  * 6-dp rounding Spark's `round` uses (NaN/∞ passed through like Spark),
  * and the same (rd2 with NaN-greatest double order, c_id) tie-break that
  * Catalyst's struct ordering applies inside `array_sort` — so outputs
  * are bit-identical and the DuckDB oracles replay unchanged. The plan
  * shape is untouched: same g_id equi-join, same columns, PlanSpec pins
  * still hold.
  *
  * CodegenFallback: the expression body is one fused per-row loop over
  * ~√K centroids × dim doubles — the eval call overhead is amortized over
  * thousands of FLOPs, and the surrounding projection still codegens.
  */
case class IvfTopPicksExpression(vec: Expression, vv: Expression,
  cents: Expression, nPicks: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, vv, cents, nPicks)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_top_picks"

  override def dataType: DataType = IvfTopPicksExpression.OutType

  override def checkInputDataTypes(): TypeCheckResult = {
    def isDoubleArray(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val centsOk = cents.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(0).dataType == LongType && isDoubleArray(fs(1).dataType) &&
          fs(2).dataType == DoubleType
      case _ => false
    }
    if (isDoubleArray(vec.dataType) && vv.dataType == DoubleType && centsOk &&
      nPicks.dataType == IntegerType && nPicks.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ivf_top_picks(array<double>, double, array<struct<c_id:long," +
        "cv:array<double>,cc:double>>, int literal) — got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val s = vv.eval(input)
    val cs = cents.eval(input)
    val n = nPicks.eval(input)
    if (v == null || s == null || cs == null || n == null) null
    else IvfTopPicksExpression.picks(v.asInstanceOf[ArrayData],
      s.asInstanceOf[Double], cs.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): IvfTopPicksExpression =
    copy(vec = newChildren(0), vv = newChildren(1), cents = newChildren(2),
      nPicks = newChildren(3))
}

object IvfTopPicksExpression {

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("rd2", DoubleType, nullable = false),
    StructField("c_id", LongType, nullable = false))), containsNull = false)

  /** Spark's double `round` semantics verbatim: NaN/∞ pass through
    * (BigDecimal.valueOf would throw), else the exact BigDecimal HALF_UP
    * path — the one convention every oracle-facing kernel shares.
    */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Catalyst's DoubleType ordering (nan-safe: NaN greatest, ±0.0 equal) —
    * what array_sort applied to the struct's leading field.
    */
  private def cmpD(x: Double, y: Double): Int =
    if (java.lang.Double.isNaN(x) && java.lang.Double.isNaN(y)) 0
    else if (java.lang.Double.isNaN(x)) 1
    else if (java.lang.Double.isNaN(y)) -1
    else if (x < y) -1 else if (x > y) 1 else 0

  def picks(vArr: ArrayData, vv: Double, cents: ArrayData, nPicks: Int): ArrayData = {
    val v = vArr.toDoubleArray()
    val m = cents.numElements()
    val rd2 = new Array[Double](m)
    val cid = new Array[Long](m)
    var i = 0
    while (i < m) {
      val c = cents.getStruct(i, 3)
      val cv = c.getArray(1)
      var dp = 0.0
      var k = 0
      // min(), DELIBERATELY (r17 ADVICE adjudication): bit-parity with
      // DotProductExpression.dot — the lambda form this expression replays
      // (Round17Spec pins equality) computes its dot via vec_dot, which
      // truncates to the shorter array. Int8DotExpression throws instead
      // because nothing replays through it; here a loud check would break
      // the pinned replay contract. Mixed-dim corpora are rejected
      // upstream (ivf2Corpus derives every vector from one embedder).
      val dim = math.min(v.length, cv.numElements())
      while (k < dim) { dp += v(k) * cv.getDouble(k); k += 1 }
      rd2(i) = round6(vv - 2.0 * dp + c.getDouble(2))
      cid(i) = c.getLong(0)
      i += 1
    }
    // selection by full index sort — m ≈ √K is small; the comparator is
    // exactly array_sort's struct order (rd2 nan-safe, then c_id)
    val idx = Array.range(0, m)
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = cmpD(rd2(a), rd2(b))
        if (c != 0) c else java.lang.Long.compare(cid(a), cid(b))
      }
    })
    val take = math.max(0, math.min(nPicks, m))
    val out = new Array[Any](take)
    i = 0
    while (i < take) {
      val j = boxed(i).intValue()
      out(i) = InternalRow(rd2(j), cid(j))
      i += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def functionDescription = (
    new FunctionIdentifier("ivf_top_picks"),
    new ExpressionInfo(classOf[IvfTopPicksExpression].getName, "ivf_top_picks"),
    (children: Seq[Expression]) => IvfTopPicksExpression(children(0),
      children(1), children(2), children(3)): Expression)

  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = functionDescription
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
