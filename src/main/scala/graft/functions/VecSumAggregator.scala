package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed elementwise vector-sum aggregator (SURVEY.md §2.10 custom-agg
  * tier): Σ v per group over `array<double>` columns, one primitive
  * double array as the aggregation buffer.
  *
  * Why (r17 — the measured centroid-update lever): the previous centroid
  * update `posexplode(v) → groupBy(c_id, pos) → avg` multiplies the
  * corpus by dim before the exchange — 12.8M narrow rows through a
  * shuffle at sf10 for a K×dim result. This aggregator runs inside
  * ObjectHashAggregate: each partition folds its rows into K primitive
  * arrays (object buffer, no per-row serialization), and the exchange
  * carries only K·partitions partial sums — the classic map-side-combine
  * shape the explode form cannot reach because its combine keys are
  * (c_id, pos) AFTER the row multiplication.
  *
  * Ordering note: double summation order changes (per-partition fold +
  * merge vs Spark's per-(c_id,pos) partial sums) — both are already
  * nondeterministic under partitioning, which is exactly why every
  * centroid consumer rounds components to 9 dp before use; the 9-dp
  * absorber covers this reordering the same way it covers repartitioning.
  */
class VecSumAggregator extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  private def add(b: Array[Double], v: Seq[Double]): Array[Double] =
    if (v == null) b
    else {
      val out = if (b.length >= v.length) b else java.util.Arrays.copyOf(b, v.length)
      var i = 0
      val it = v.iterator
      while (it.hasNext) { out(i) += it.next(); i += 1 }
      out
    }

  override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = add(b, a)

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def finish(r: Array[Double]): Seq[Double] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(r)

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VecSumAggregator {
  /** Untyped-column form for `groupBy(...).agg(...)` call sites. */
  def vecSum: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new VecSumAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
}
