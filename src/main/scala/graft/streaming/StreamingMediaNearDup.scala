package graft.streaming

import graft.multimodal.{MediaFunctions, MediaRow}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Streaming image near-duplicate detection — the ingest-path twin of
  * batch q170 (r14 verdict item 2): each arriving image is dHashed
  * (the SAME [[MediaFunctions.dHash]] kernel, so stream and batch can
  * never disagree on the fingerprint), split into the same 8×8-bit
  * Manku blocks, and routed into per-(block, key) LSH buckets whose
  * state holds every fingerprint ever seen there. A new image compares
  * against only its bucket cohorts — never the whole history — and
  * emits a pair when true Hamming distance clears the threshold; the
  * block pigeonhole makes this EXACT (≤ maxHamming differing bits
  * cannot touch all maxHamming+1 blocks), so the emitted pair set over
  * any arrival order equals batch q170's pairs (idempotent emission —
  * a pair may surface from several blocks; consumers dedup, the
  * StreamingNearDup contract).
  *
  * Scale shape: a micro-batch shuffles its own rows 8 times (one per
  * block) keyed by 8-bit-block values; state per bucket is the images
  * sharing that block byte — perceptual-collision mass, not the corpus.
  */
object StreamingMediaNearDup {

  case class PhashDoc(mediaId: Long, phash: Long)
  case class BlockDoc(blockKey: String, mediaId: Long, phash: Long)
  case class PhashPair(aId: Long, bId: Long, hamming: Int)
  private case class Member(mediaId: Long, phash: Long)

  val NumBlocks = 8
  val BlockBits = 8

  private class BucketProcessor(maxHamming: Int)
    extends StatefulProcessor[String, BlockDoc, PhashPair] {
    @transient private var st: ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Member](
        "members", Encoders.product[Member], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, it: Iterator[BlockDoc],
      tv: TimerValues): Iterator[PhashPair] = {
      val arrivals = it.toSeq.sortBy(_.mediaId)
      val out = scala.collection.mutable.ArrayBuffer.empty[PhashPair]
      var cohort = st.get().map(m => (m.mediaId, m.phash)).toVector
      arrivals.foreach { d =>
        cohort.foreach { case (id, ph) =>
          val ham = java.lang.Long.bitCount(ph ^ d.phash)
          if (ham <= maxHamming && id != d.mediaId)
            out += (if (id < d.mediaId) PhashPair(id, d.mediaId, ham)
            else PhashPair(d.mediaId, id, ham))
        }
        cohort :+= ((d.mediaId, d.phash))
        st.appendValue(Member(d.mediaId, d.phash))
      }
      out.iterator
    }
  }

  /** Near-dup image pairs (aId < bId) from a media stream; threshold
    * defaults to batch q170's. The pigeonhole exactness guarantee needs
    * maxHamming + 1 ≤ NumBlocks (≤ maxHamming differing bits cannot
    * touch all blocks), so a wider threshold fails loudly instead of
    * silently dropping recall (r15 review finding).
    */
  def pairs(media: Dataset[MediaRow], maxHamming: Int = 7): Dataset[PhashPair] = {
    require(maxHamming >= 0 && maxHamming < NumBlocks,
      s"exact block pigeonhole needs 0 <= maxHamming < $NumBlocks blocks, " +
        s"got $maxHamming — widen NumBlocks/BlockBits together to raise it")
    val spark = media.sparkSession
    import spark.implicits._
    MediaFunctions.perceptualHash(media)
      // degenerate-fingerprint quarantine (batch q170's exact rule, so
      // the stream==batch pair law survives): an all-0/all-1 dHash is a
      // whole visual class — its bucket state would grow with every flat
      // image ever ingested and each arrival would emit a pair against
      // ALL of them (N² emission AND N² state). Withheld from routing;
      // the mass stays visible via BandSkewReport.maintainPhashEvery.
      .filter(p => !MediaFunctions.isDegenerate(p.phash))
      .flatMap(p => (0 until NumBlocks).map { b =>
        val bk = (p.phash >>> (b * BlockBits)) & ((1L << BlockBits) - 1)
        BlockDoc(s"$b:$bk", p.mediaId, p.phash)
      })
      .groupByKey(_.blockKey)
      .transformWithState(
        new BucketProcessor(maxHamming), TimeMode.None(), OutputMode.Append())
  }
}
