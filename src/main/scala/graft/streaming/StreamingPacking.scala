package graft.streaming

import graft.queries.AssemblyQueries
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Streaming sequence packing: the incremental counterpart of batch q132
  * for an APPEND-ONLY corpus. Documents arrive on a stream in doc_id order
  * (the shape an ingest pipeline produces — ids are assigned monotonically
  * as documents land); each is appended to its (source, shard) token
  * stream and assigned the training-window ids its tokens fall into, using
  * the exact integer arithmetic of the batch form — so for ANY in-order
  * batching of the corpus, the streamed assignments aggregate to
  * byte-identical q132 manifests (the spec's stream==batch law).
  *
  * Scale shape: each micro-batch shuffles only its own documents, keyed by
  * (source, shard) — the same key that bounds the batch window's
  * sequential extent — and state per key is ONE (maxDocId, cumTokens)
  * record regardless of corpus size, living in the RocksDB state store,
  * not driver memory. A 100 TB corpus is millions of shard keys × 16
  * bytes of state: the packing frontier, not the packing history.
  *
  * Out-of-order arrivals (docId ≤ the shard's frontier) CANNOT be packed
  * incrementally — the batch form would have placed every later token
  * after them, so silently appending would diverge from q132 forever.
  * They are emitted with `late = true` and `binId = binEnd = -1`, state
  * untouched: the signal for a downstream re-pack of that shard (the
  * same contract as a compaction trigger), never a silent corruption.
  */
object StreamingPacking {

  /** One arriving document, already reduced to its token count (the
    * packing operator never needs the text).
    */
  case class DocTok(source: String, docId: Long, nt: Long)

  /** Per-(source, shard) packing frontier. */
  case class PackState(maxDocId: Long, cumTokens: Long)

  /** `binId` = the window this doc STARTS in, `binEnd` = the window its
    * last token lands in (binEnd > binId ⇒ the doc straddles a boundary)
    * — the exact columns batch q132 derives from its running sum.
    */
  case class PackAssign(source: String, shard: Long, docId: Long, nt: Long,
    binId: Long, binEnd: Long, late: Boolean)

  private[streaming] class PackProcessor(budget: Long)
    extends StatefulProcessor[(String, Long), DocTok, PackAssign] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[PackState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PackState](
        "packState", Encoders.product[PackState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (String, Long), it: Iterator[DocTok],
      tv: TimerValues): Iterator[PackAssign] = {
      val batch = it.toSeq.sortBy(_.docId)
      var s = if (st.exists()) st.get() else PackState(-1L, 0L)
      val out = batch.map { d =>
        if (d.docId <= s.maxDocId)
          PackAssign(d.source, key._2, d.docId, d.nt, -1L, -1L, late = true)
        else {
          val cum = s.cumTokens + d.nt
          s = PackState(d.docId, cum)
          PackAssign(d.source, key._2, d.docId, d.nt,
            math.floorDiv(cum - d.nt, budget), math.floorDiv(cum - 1, budget),
            late = false)
        }
      }
      st.update(s)
      out.iterator
    }
  }

  /** Assign every arriving document its pack windows. Constants are the
    * batch q132's (`AssemblyQueries.PackBudget` / `PackShardDocs`) so the
    * two forms stay one contract.
    */
  def pack(docs: Dataset[DocTok],
    budget: Long = AssemblyQueries.PackBudget,
    shardDocs: Long = AssemblyQueries.PackShardDocs): Dataset[PackAssign] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => (d.source, math.floorDiv(d.docId, shardDocs)))
      .transformWithState(
        new PackProcessor(budget), TimeMode.None(), OutputMode.Append())
  }
}
