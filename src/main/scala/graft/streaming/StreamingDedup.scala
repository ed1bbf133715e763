package graft.streaming

import graft.functions.TextFunctions.normText
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication: the incremental counterpart of batch q25.
  * New documents arrive on a stream; each is fingerprinted (md5 of the same
  * canonical form q25 keys on) and checked against every document EVER seen —
  * across micro-batch boundaries — via `flatMapGroupsWithState` keyed on the
  * fingerprint.
  *
  * Scale shape: each micro-batch shuffles only its own documents, keyed by a
  * uniform 128-bit hash (no skew by construction). The dedup memory lives in
  * the streaming state store (checkpointed, per-key, RocksDB-backed on a real
  * cluster), NOT driver memory: state per fingerprint is one (firstId, count)
  * record, so 10^10 historical docs is ~100s of GB spread across the
  * executors — the same storage a batch dedup's build side would need, but
  * amortized over the stream's lifetime.
  *
  * State is deliberately NoTimeout: "have we ever seen this content" must not
  * forget. A bounded-retention variant (TTL via timeouts) is a policy choice
  * for feeds where only recent duplicates matter.
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

  def dedup(docs: Dataset[Doc]): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._
    val keyed = docs
      .select(col("docId"), md5(normText(col("text"))).as("fp"))
      .as[FpDoc]
    keyed
      .groupByKey(_.fp)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (fp: String, it: Iterator[FpDoc], state: GroupState[FpState]) => {
          // deterministic within a micro-batch: the lowest docId wins the
          // canonical slot when a fingerprint first appears (same tie-break
          // as batch q25's min(doc_id))
          val batch = it.toSeq.sortBy(_.docId)
          var st = state.getOption.getOrElse(FpState(-1L, 0L))
          val out = batch.map { d =>
            if (st.firstId < 0) st = FpState(d.docId, 0L)
            st = st.copy(nSeen = st.nSeen + 1)
            DedupVerdict(d.docId, fp, d.docId != st.firstId, st.firstId, st.nSeen)
          }
          state.update(st)
          out.iterator
        })
  }
}
