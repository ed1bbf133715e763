package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a custom typed aggregate — the
  * datasketches direction the reference leaves as a TODO (readme.md:226),
  * applied to its supernode problem: finding hot keys (SuperNodeCollector
  * .scala:13-65 learns them with full per-key counters; the sketch needs
  * only k counters per partition).
  *
  * Buffer = at most k (item → lower-bound count) pairs. The classic
  * guarantees, preserved by this merge (Agarwal et al., "Mergeable
  * Summaries"):
  *
  *   - any item with true frequency > N/(k+1) is in the final sketch;
  *   - every kept count undercounts by at most N/(k+1).
  *
  * So a two-phase exact heavy-hitters query is safe: the sketch's key set
  * is a superset of every item above the N/(k+1) bar, and one exact
  * recount of just those candidates (a broadcast semi-join — the corpus
  * never shuffles by key) yields exact counts. The buffer is O(k), merges
  * associatively across partitions (map-side partial aggregation works),
  * and fits streaming state where a full groupBy would not.
  */
class FrequentItemsAggregator(k: Int)
  extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"need at least one counter, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1L)
      case None if buf.size < k => buf.updated(x, 1L)
      // full and x unseen: decrement every counter (x's implicit 1 included
      // — it dies immediately), dropping zeros. This is the step that costs
      // each surviving counter at most one unit per N/(k+1) misses.
      case None => buf.collect { case (y, c) if c > 1L => y -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (y, c)) =>
      m.updated(y, m.getOrElse(y, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // trim back to k counters: subtract the (k+1)-th largest count from
      // all (the mergeable-summaries offset trick), drop non-positives.
      val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      summed.collect { case (y, c) if c > cut => y -> (c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
