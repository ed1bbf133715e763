package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY.md §2.10 — the `TypedImperativeAggregate`
  * tier, public `Aggregator` API): one-pass MinHash signature sketch.
  *
  * Input rows are (h0, h1) hash pairs per shingle; the buffer is the running
  * k-wise minimum of the double-hashed family g_k = h0 + k·h1 — the same
  * family DedupQueries.signatures computes with k `min()` columns. The
  * aggregate form matters at scale for streaming/sketch pipelines: the
  * buffer is fixed-size (k longs), merges associatively across partitions,
  * and drops into `Dataset.groupByKey.agg` or a streaming aggregation where
  * per-column min expressions can't (e.g. when k is runtime-configurable).
  */
class MinHashAggregator(numHashes: Int)
  extends Aggregator[(Long, Long), Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val (h0, h1) = in
    var k = 0
    while (k < numHashes) {
      val g = h0 + k * h1
      if (g < buf(k)) buf(k) = g
      k += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
