package graft.streaming

import graft.functions.TextFunctions.normText
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming exact deduplication: the incremental counterpart of batch q25.
  * New documents arrive on a stream; each is fingerprinted (md5 of the same
  * canonical form q25 keys on) and checked against every document EVER seen —
  * across micro-batch boundaries — via `transformWithState` keyed on the
  * fingerprint (the Spark 4 state API; requires the RocksDB state store
  * provider, which is also the production choice).
  *
  * Scale shape: each micro-batch shuffles only its own documents, keyed by a
  * uniform 128-bit hash (no skew by construction). The dedup memory lives in
  * the streaming state store (checkpointed, per-key, RocksDB-backed), NOT
  * driver memory: state per fingerprint is one (firstId, count) record, so
  * 10^10 historical docs is ~100s of GB spread across the executors — the
  * same storage a batch dedup's build side would need, but amortized over
  * the stream's lifetime.
  *
  * State is deliberately TTL-free: "have we ever seen this content" must not
  * forget. Bounded retention for feeds where only recent duplicates matter
  * is now a one-line policy — pass a TTL to the processor and the state
  * store expires records itself (the API-native eviction
  * `flatMapGroupsWithState` had to hand-roll with timeouts).
  */
object StreamingDedup {

  case class Doc(docId: Long, text: String)
  case class FpDoc(docId: Long, fp: String)
  case class FpState(firstId: Long, nSeen: Long)
  /** `nthOccurrence` is 1-based: 1 = canonical copy, k = the (k−1)th dup —
    * the signal a downstream "keep at most N copies" policy filters on.
    */
  case class DedupVerdict(
    docId: Long, fp: String, isDuplicate: Boolean, firstSeenId: Long,
    nthOccurrence: Long)

  /** Per-fingerprint state machine: first arrival claims the canonical
    * slot (lowest docId within a micro-batch, matching batch q25's
    * min(doc_id)); every arrival increments the occurrence counter.
    */
  private[streaming] class DedupProcessor(ttl: TTLConfig)
    extends StatefulProcessor[String, FpDoc, DedupVerdict] {
    @transient private var st: ValueState[FpState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FpState](
        "fpState", Encoders.product[FpState], ttl)

    override def handleInputRows(fp: String, it: Iterator[FpDoc],
      tv: TimerValues): Iterator[DedupVerdict] = {
      val batch = it.toSeq.sortBy(_.docId)
      var s = if (st.exists()) st.get() else FpState(-1L, 0L)
      val out = batch.map { d =>
        if (s.firstId < 0) s = FpState(d.docId, 0L)
        s = s.copy(nSeen = s.nSeen + 1)
        DedupVerdict(d.docId, fp, d.docId != s.firstId, s.firstId, s.nSeen)
      }
      st.update(s)
      out.iterator
    }
  }

  def dedup(docs: Dataset[Doc], ttl: TTLConfig = TTLConfig.NONE): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("docId"), md5(normText(col("text"))).as("fp"))
      .as[FpDoc]
      .groupByKey(_.fp)
      .transformWithState(
        new DedupProcessor(ttl), TimeMode.None(), OutputMode.Append())
  }
}
