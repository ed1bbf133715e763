package graft.streaming

import graft.multimodal.{MediaFunctions, MediaRow}
import graft.queries.BandSkewReport
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The media tier's deployment surface (r16 verdict item 4 — the
  * `StreamingCorpusBuild.route` pattern applied to images): ONE entry
  * point that turns a media stream into a durable fingerprint store, the
  * near-dup pair ledger, and the phash skew audit — so an image corpus
  * gets its evidence automatically, not only when an operator remembers
  * to call the pieces.
  *
  * Per micro-batch, from one decode pass (the expensive stage — the hash
  * runs ONCE per image, everything downstream reads the stored longs):
  *
  *   1. `root/phash/batch=<id>` — every fingerprint, degenerate included
  *      (the audit must see the quarantined mass), stamped with the batch
  *      id; overwrite-per-batch, so an at-least-once replay lands the
  *      same rows (the house idempotence contract).
  *   2. `root/pairs/batch=<id>` — near-dup pairs (a_id < b_id, true
  *      Hamming ≤ `maxHamming`) between THIS batch's images and the
  *      accumulated store, by the same lossless 8×8-bit Manku block
  *      equi-join as batch q170 (pigeonhole: ≤ maxHamming differing bits
  *      must share one whole block), with batch q170's degenerate-key
  *      quarantine on both sides. Every pair emits exactly once — in the
  *      batch of its LATER member (the earlier member is already in the
  *      store; both-old pairs never rejoin) — so the union over batches
  *      equals batch q170's pair set on the full corpus (Round17Spec).
  *      Unlike [[StreamingMediaNearDup]] (executor state store), the
  *      cohort index lives in the phash PARQUET store: state survives
  *      any restart, is SQL-queryable, and scales as a keyed equi-join
  *      per batch — the 100 TB shape.
  *   3. `root/phash_audit/run=<k>` — [[BandSkewReport.maintainPhashEvery]]
  *      over the ACCUMULATED store on the maintenance cadence
  *      (batch-derived replay-idempotent run ids).
  *
  * Replay safety: the store side of the pair join reads only batches
  * with id < current (the current batch's own dir — possibly a stale
  * replay — is excluded by the stamp, then re-overwritten), so a
  * replayed batch recomputes exactly its original pairs.
  */
object StreamingMediaRoute {

  def route(media: Dataset[MediaRow], root: String, checkpointDir: String,
    trigger: Trigger = Trigger.AvailableNow(),
    maxHamming: Int = 7,
    auditCadence: Long = 0): StreamingQuery = {
    require(maxHamming >= 0 && maxHamming < StreamingMediaNearDup.NumBlocks,
      s"exact block pigeonhole needs 0 <= maxHamming < " +
        s"${StreamingMediaNearDup.NumBlocks} blocks, got $maxHamming")
    val s = media.sparkSession
    media.toDF()
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val ph = MediaFunctions.perceptualHash(
          b.as[MediaRow](Encoders.product[MediaRow])).toDF()
          .withColumn("batch_id", lit(id))
          .persist()
        try {
          ph.write.mode(SaveMode.Overwrite).parquet(s"$root/phash/batch=$id")
          val storeBefore = s.read.parquet(s"$root/phash/batch=*")
            .filter(col("batch_id") < id)
          writePairs(ph, storeBefore, maxHamming,
            s"$root/pairs/batch=$id")
          if (auditCadence > 0)
            BandSkewReport.maintainPhashEvery(
              s.read.parquet(s"$root/phash/batch=*")
                .filter(col("batch_id") <= id)
                .select(col("phash").as("h64")),
              s"$root/phash_audit", id, auditCadence)
          ()
        } finally { ph.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Batch q170's block-keyed pair kernel between the NEW fingerprints
    * and new ∪ store: blk/bk equi-join, true-Hamming verify inside the
    * join, least/greatest orientation, distinct (a within-batch pair
    * surfaces from both sides and possibly several blocks).
    */
  private def writePairs(newPh: DataFrame, store: DataFrame,
    maxHamming: Int, out: String): Unit = {
    def keyed(df: DataFrame): DataFrame = df
      .filter(col("phash") =!= 0L && col("phash") =!= -1L)
      .select(col("mediaId"), col("phash"),
        posexplode(array((0 until StreamingMediaNearDup.NumBlocks).map(blk =>
          shiftright(col("phash"), blk * StreamingMediaNearDup.BlockBits)
            .bitwiseAND(lit((1L << StreamingMediaNearDup.BlockBits) - 1))): _*))
          .as(Seq("blk", "bk")))
    keyed(newPh).as("a")
      .join(keyed(store.select("mediaId", "phash")
        .unionByName(newPh.select("mediaId", "phash"))).as("b"),
        col("a.blk") === col("b.blk") && col("a.bk") === col("b.bk") &&
          col("a.mediaId") =!= col("b.mediaId"))
      .select(least(col("a.mediaId"), col("b.mediaId")).as("a_id"),
        greatest(col("a.mediaId"), col("b.mediaId")).as("b_id"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .write.mode(SaveMode.Overwrite).parquet(out)
  }

  /** The accumulated pair ledger (what a dedup consumer reads). */
  def pairs(s: SparkSession, root: String): DataFrame =
    s.read.parquet(s"$root/pairs/batch=*")

  /** The accumulated fingerprint store. */
  def phashes(s: SparkSession, root: String): DataFrame =
    s.read.parquet(s"$root/phash/batch=*")
}
