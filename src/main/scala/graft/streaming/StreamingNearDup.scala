package graft.streaming

import graft.functions.TextFunctions._
import graft.functions.{Hash60Expression, WordShinglesExpression}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming MinHash-LSH near-duplicate detection: the incremental
  * counterpart of batch q27. Each arriving document is shingled, MinHash
  * signed (same Kirsch–Mitzenmacher double-hashing scheme as the batch
  * pipeline: g_k = h0 + k·(h1 mod 2^56) over md5-derived shingle hashes),
  * and banded; each band key routes the doc into an LSH bucket whose state
  * holds the signatures of every doc EVER seen in that bucket. A new doc
  * compares against only its bucket cohort — never the whole history —
  * and emits a pair when the estimated Jaccard (equal-minhash fraction)
  * clears the threshold.
  *
  * Scale shape: a micro-batch shuffles its own docs `numBands` times (once
  * per band explosion) keyed by 128-bit band hashes — uniform unless docs
  * truly collide, which is exactly the near-dup case. State is per-bucket
  * in the state store (RocksDB-backed on a cluster), proportional to the
  * number of docs sharing band hashes — the near-dup mass, a tiny fraction
  * of the corpus — NOT the corpus itself. Docs whose buckets never collide
  * cost one state record per band and are never compared.
  *
  * The same pair can surface from several bands (and re-surface if a later
  * doc bridges old buckets); downstream consumers treat pair emission as
  * idempotent (the batch pipeline's `distinct()` equivalent is a keyed
  * sink upsert, or `dropDuplicates` with a watermark when bounded
  * retention is acceptable).
  */
object StreamingNearDup {

  case class Doc(docId: Long, text: String)
  case class BandDoc(bandKey: String, docId: Long, sig: Seq[Long])
  case class NearDupPair(aId: Long, bId: Long, estSim: Double)

  private val ShingleN = 3
  private val DoubleHashMod = 1L << 56

  /** Near-dup pairs (aId < bId) from a document stream. `numHashes`,
    * `numBands`, and `threshold` default to the batch q27 parameters
    * (12 hashes, 3 bands × 4 rows, est-Jaccard ≥ 0.5).
    */
  def pairs(
    docs: Dataset[Doc],
    numHashes: Int = 12,
    numBands: Int = 3,
    threshold: Double = 0.5): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    WordShinglesExpression.register(spark)
    Hash60Expression.register(spark)
    val rowsPerBand = numHashes / numBands
    require(rowsPerBand * numBands == numHashes, "bands must tile the signature")

    // per-row signature: shingle hashes once, then numHashes mins over the
    // array (higher-order exprs — micro-batches are small; the batch path
    // uses the explode+groupBy form for full-corpus scans)
    val sh = shingles(toks(col("text")), ShingleN)
    val h0 = transform(sh, g => hash64(g, 0))
    val h1 = transform(sh, g => pmod(hash64(g, 1), lit(DoubleHashMod)))
    val sig = array((0 until numHashes).map(k =>
      array_min(zip_with(h0, h1, (a, b) => a + lit(k.toLong) * b))): _*)
    val bandKeys = array((0 until numBands).map { b =>
      val ms = (0 until rowsPerBand).map(r => col("sig")(b * rowsPerBand + r))
      md5(concat_ws(",", lit(b.toString) +: ms: _*))
    }: _*)

    docs
      .filter(size(toks(col("text"))) >= ShingleN) // no shingles → no signature
      .select(col("docId"), sig.as("sig"))
      .select(col("docId"), col("sig"), explode(bandKeys).as("bandKey"))
      .as[BandDoc]
      .groupByKey(_.bandKey)
      .transformWithState(
        new BucketProcessor(numHashes, threshold),
        TimeMode.None(), OutputMode.Append())
  }

  /** Per-LSH-bucket state machine: the cohort of (docId, signature) records
    * ever routed to this band key, held as a LIST state variable — the
    * `transformWithState` API appends a new member without rewriting the
    * whole cohort (the Seq-valued `GroupState` this replaces rewrote the
    * full blob every batch).
    */
  case class Member(docId: Long, sig: Seq[Long])

  private[streaming] class BucketProcessor(numHashes: Int, threshold: Double)
    extends StatefulProcessor[String, BandDoc, NearDupPair] {
    @transient private var cohort: ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cohort = getHandle.getListState[Member](
        "cohort", Encoders.product[Member], TTLConfig.NONE)

    override def handleInputRows(bandKey: String, it: Iterator[BandDoc],
      tv: TimerValues): Iterator[NearDupPair] = {
      // deterministic within a micro-batch: lower docId joins the bucket
      // first, mirroring batch q27's a_id < b_id orientation
      val batch = it.toSeq.sortBy(_.docId)
      var members = if (cohort.exists()) cohort.get().toVector else Vector.empty
      val out = Seq.newBuilder[NearDupPair]
      batch.foreach { d =>
        members.foreach { m =>
          if (m.docId != d.docId) {
            val eq = m.sig.iterator.zip(d.sig.iterator).count { case (a, b) => a == b }
            val est = eq.toDouble / numHashes
            if (est >= threshold)
              out += NearDupPair(math.min(m.docId, d.docId), math.max(m.docId, d.docId), est)
          }
        }
        if (!members.exists(_.docId == d.docId)) {
          members :+= Member(d.docId, d.sig)
          cohort.appendValue(Member(d.docId, d.sig))
        }
      }
      out.result().iterator
    }
  }
}
