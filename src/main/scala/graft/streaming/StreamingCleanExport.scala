package graft.streaming

import graft.functions.TextFunctions.{bigrams, normText, qualityScore, toks}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming clean-corpus gate: the incremental counterpart of batch q108.
  * Every arriving document gets its keep/drop verdict the moment it lands —
  * exact-dup against every document EVER seen (state-store memory across
  * micro-batches, the same per-fingerprint record shape as
  * [[StreamingDedup]]), then the stateless screens (phrase blocklist,
  * quality floor) — under the same fixed rule priority as batch q108:
  * exact_dup > blocklist > quality > kept.
  *
  * Scale shape: the stateless screens are per-row column arithmetic on the
  * micro-batch (no state, no shuffle); the only shuffle is the uniform
  * 128-bit fingerprint key for the dedup state. Near-dup screening is
  * deliberately NOT inlined here — pair emission is inherently cross-doc
  * and lives in [[StreamingNearDup]], which composes downstream of the
  * kept stream exactly like batch q108 consumes q65's labels.
  */
object StreamingCleanExport {

  case class Doc(docId: Long, text: String)
  // encoder-visible (Spark's generated projections cannot read private types)
  case class Screened(
    docId: Long, fp: String, blocked: Boolean, lowQuality: Boolean, text: String)
  case class FpState(firstId: Long)
  case class Verdict(docId: Long, keep: Boolean, reason: String)
  case class VerdictDoc(docId: Long, keep: Boolean, reason: String, text: String)

  def gate(docs: Dataset[Doc], blocklist: Seq[String], qualityMin: Double)
  : Dataset[Verdict] = {
    import docs.sparkSession.implicits._
    gateWithText(docs, blocklist, qualityMin)
      .select("docId", "keep", "reason").as[Verdict]
  }

  /** [[gate]] with the document text carried through the verdict — the
    * composition surface: downstream incremental stages (near-dup pairing,
    * feature extraction) consume the KEPT stream without a stream-stream
    * join back to the source. `maskPii = true` additionally scrubs
    * emails/cards/SSNs/phones/IPs from the carried text (the q124 kernel — stateless
    * per-row column work, so it adds nothing to the gate's state or
    * shuffle): dedup fingerprints are computed over the ORIGINAL text
    * (two docs differing only in contact details are near-dups, not exact
    * dups), while everything downstream of the gate sees only scrubbed
    * content.
    */
  def gateWithText(docs: Dataset[Doc], blocklist: Seq[String], qualityMin: Double,
    maskPii: Boolean = false)
  : Dataset[VerdictDoc] = {
    // only uni- and bi-gram phrases are matchable (the gram stream is
    // tokens ∪ sliding bigrams); fail loudly rather than silently never
    // firing on a wider phrase
    require(blocklist.forall(_.trim.split("\\s+").length <= 2),
      s"blocklist phrases must be 1 or 2 words: " +
        blocklist.filter(_.trim.split("\\s+").length > 2).mkString(", "))
    import docs.sparkSession.implicits._
    // streaming route bypasses Tables.load — register the native bigram
    // kernel behind TextFunctions.bigrams (r19)
    graft.functions.WordBigramsExpression.register(docs.sparkSession)
    val uni = blocklist.filter(!_.contains(' '))
    val bi = blocklist.filter(_.contains(' '))
    val tk = toks(col("text"))
    val hitUni = exists(tk, t => t.isInCollection(uni))
    val hitBi = exists(bigrams(tk), g => g.isInCollection(bi))
    val carried =
      if (maskPii) graft.functions.PiiFunctions.maskPii(col("text"))
      else col("text")
    val screened = docs.select(
      col("docId"),
      md5(normText(col("text"))).as("fp"),
      (hitUni || hitBi).as("blocked"),
      (round(qualityScore(tk), 4) < qualityMin).as("lowQuality"),
      carried.as("text")).as[Screened]
    screened
      .groupByKey(_.fp)
      .transformWithState(
        new GateProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Canonical-doc policy: WITHIN a micro-batch the lowest docId claims the
    * slot (matching batch q25/q108); ACROSS batches the first arrival keeps
    * it — an intended deviation from the batch export's global-min-id rule,
    * because revoking an already-emitted "kept" verdict would need a
    * retraction, which Append mode cannot express. Batch q108 remains the
    * whole-corpus authority; this gate is its monotone incremental
    * approximation.
    */
  private[streaming] class GateProcessor
    extends StatefulProcessor[String, Screened, VerdictDoc] {
    @transient private var st: ValueState[FpState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FpState](
        "fpState", Encoders.product[FpState], TTLConfig.NONE)

    override def handleInputRows(fp: String, it: Iterator[Screened],
      tv: TimerValues): Iterator[VerdictDoc] = {
      val batch = it.toSeq.sortBy(_.docId)
      var s = if (st.exists()) st.get() else FpState(-1L)
      val out = batch.map { d =>
        if (s.firstId < 0) s = FpState(d.docId)
        val reason =
          if (d.docId != s.firstId) "exact_dup"
          else if (d.blocked) "blocklist"
          else if (d.lowQuality) "quality"
          else "kept"
        VerdictDoc(d.docId, reason == "kept", reason, d.text)
      }
      st.update(s)
      out.iterator
    }
  }
}
