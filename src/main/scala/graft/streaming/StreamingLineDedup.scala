package graft.streaming

import graft.queries.TextQueries
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming LINE-level keep-first dedup: the incremental twin of batch
  * q142 (the C4 recipe — a line seen anywhere earlier in the corpus is
  * dropped from every later doc). New documents arrive on a stream; each
  * explodes through the SAME line geometry as q142
  * ([[TextQueries.docLines]] — one definition, the twins cannot diverge)
  * and every line is checked against every line EVER seen via
  * `transformWithState` keyed on the line hash.
  *
  * Semantics: the stream keeps the EARLIEST-ARRIVED copy (arrival-time
  * order — what an ingest pipeline genuinely wants). Batch q142 keeps the
  * lowest encoded rank (doc_id·10⁶ + idx); under append-only ingest in
  * doc_id order the two orders coincide, and the spec pins streamed
  * verdicts == batch q142 across micro-batch boundaries. An arrival whose
  * rank is LOWER than the stored first (possible only out of order) is
  * flagged `outOfOrder` rather than silently re-ranked — the re-dedup
  * trigger, mirroring StreamingPacking's late-flag contract.
  *
  * Scale shape: each micro-batch shuffles only its own lines, keyed by a
  * uniform 128-bit hash; state per line-type is one long in RocksDB —
  * the same memory a batch build side would hold, amortized over the
  * stream's lifetime, never on the driver.
  */
object StreamingLineDedup {

  case class Doc(docId: Long, text: String)
  case class Line(docId: Long, idx: Int, h: Long, ntk: Long, rk: Long)
  case class LineVerdict(
    docId: Long, idx: Int, h: Long, ntk: Long, kept: Boolean,
    firstRk: Long, outOfOrder: Boolean)

  private[streaming] class LineProcessor
    extends StatefulProcessor[Long, Line, LineVerdict] {
    @transient private var st: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Long]("firstRk", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(h: Long, it: Iterator[Line],
      tv: TimerValues): Iterator[LineVerdict] = {
      // within one batch, claim in rank order — batch q142's min(rk)
      val batch = it.toSeq.sortBy(_.rk)
      var first = if (st.exists()) st.get() else -1L
      val out = batch.map { l =>
        if (first < 0) { first = l.rk; st.update(first) }
        LineVerdict(l.docId, l.idx, l.h, l.ntk,
          kept = l.rk == first, firstRk = first,
          outOfOrder = l.rk < first)
      }
      out.iterator
    }
  }

  /** Per-line verdict stream. Input may be a streaming Dataset. */
  def verdicts(docs: Dataset[Doc]): Dataset[LineVerdict] = {
    import docs.sparkSession.implicits._
    TextQueries.docLines(docs.toDF()
        .select(col("docId").as("doc_id"), col("text")))
      .select(col("doc_id").as("docId"), col("idx"), col("h"),
        col("ntk"), col("rk"))
      .as[Line]
      .groupByKey(_.h)
      .transformWithState(
        new LineProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Batch q142's per-doc rollup shape over an already-collected verdict
    * frame — for consumers (and the spec) comparing against the batch
    * operator's output.
    */
  def rollup(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("docId").as("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum((!col("kept")).cast("long")).as("n_dropped"),
        sum(when(col("kept"), col("ntk")).otherwise(0L)).as("kept_tokens"))
}
