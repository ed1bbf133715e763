package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed indexed-sum aggregator (the integer sibling of
  * [[VecSumAggregator]]): folds (pos, inc) rows into a fixed-`dim`
  * primitive long array per group — `out[pos] += inc`.
  *
  * Why (optimization r18 — the q139 embedder exchange): the feature-hash
  * embedder previously densified in two exchanges — `groupBy(doc_id, pos)
  * .sum(sgn)` (shuffle on (doc_id, pos)) and then `groupBy(doc_id)` with a
  * `map_from_entries(collect_list(...))` + 64 `element_at` probes per doc
  * (a second shuffle on doc_id). This aggregator runs the densification as
  * ONE ObjectHashAggregate keyed on doc_id: each partition folds its token
  * rows straight into per-doc long arrays and the single exchange carries
  * one fixed-size partial per (doc, partition). Integer addition commutes,
  * so the result is bit-identical under any partitioning — the oracle
  * replay (DuckDB recomputes every bucket sum) is untouched.
  */
class IndexedSumAggregator(dim: Int)
  extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](dim)

  override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
    // callers derive pos as a non-negative hash mod dim; a violation is a
    // caller bug — fail loudly (same contract as vec_dot_i8's length check)
    val p = in._1
    if (p < 0 || p >= dim)
      throw new IllegalArgumentException(
        s"indexed_sum: pos $p outside [0, $dim)")
    b(p.toInt) += in._2
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(b)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object IndexedSumAggregator {
  /** Untyped-column form: `indexedSum(dim)(posCol, incCol)`. */
  def indexedSum(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new IndexedSumAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
}
