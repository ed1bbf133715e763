package graft.streaming

import graft.multimodal.{MediaFunctions, MediaRow}
import graft.queries.BandSkewReport
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.file.{Files, Paths}

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
  * BOUNDED LISTING (r17 verdict item 1 — the reference compacts its
  * MVStore every 10,000 blocks for the same reason,
  * application.conf:49-57): every `compactCadence` batches the
  * accumulated `batch=<i>` dirs FOLD into one sorted store generation
  * (`root/{phash,pairs}/store`) through [[Compaction.swapIn]] — atomic
  * two-rename swap, crash-recoverable — with the fold WATERMARK (highest
  * folded batch id) committed inside the same atomic unit as a
  * `_fold_watermark` sidecar. Readers and the per-batch cohort join see
  * `store ∪ {batch dirs with id > watermark}`, so per-batch file listing
  * is O(cadence), not O(stream length). The batch-id stamp survives the
  * fold as a data COLUMN, so replay idempotence is untouched: a replayed
  * batch's `batch_id < id` store filter excludes its own already-folded
  * rows exactly as it excluded its own batch dir, and the dir it
  * re-writes (id ≤ watermark) is invisible to readers until the next
  * fold garbage-collects it. Each fold rewrites the whole store — at
  * 100 TB the store is partitioned (e.g. by phash block or ingest day)
  * and folds run per-partition, the same plug point [[Compaction]]
  * documents for the chain tier.
  *
  * Replay safety: the store side of the pair join reads only rows with
  * batch_id < current (the current batch's own rows — possibly a stale
  * replay — are excluded by the stamp, then re-overwritten), so a
  * replayed batch recomputes exactly its original pairs.
  */
object StreamingMediaRoute {

  /** Sidecar committed atomically with each folded store generation:
    * the highest batch id whose rows the store holds.
    */
  private[graft] val WatermarkFile = "_fold_watermark"

  def route(media: Dataset[MediaRow], root: String, checkpointDir: String,
    trigger: Trigger = Trigger.AvailableNow(),
    maxHamming: Int = 7,
    auditCadence: Long = 0,
    compactCadence: Long = 0,
    compactTargetFiles: Int = 4): StreamingQuery = {
    require(maxHamming >= 0 && maxHamming < StreamingMediaNearDup.NumBlocks,
      s"exact block pigeonhole needs 0 <= maxHamming < " +
        s"${StreamingMediaNearDup.NumBlocks} blocks, got $maxHamming")
    media.toDF()
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, root, maxHamming, auditCadence,
          compactCadence, compactTargetFiles)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** One micro-batch's work, factored out of the stream wiring so the
    * replay/fold laws are directly testable (Round18Spec drives batches
    * and replays by hand).
    */
  private[graft] def processBatch(b: DataFrame, id: Long, root: String,
    maxHamming: Int, auditCadence: Long, compactCadence: Long = 0,
    compactTargetFiles: Int = 4): Unit = {
    val s = b.sparkSession
    // startup repair: an interrupted fold swap leaves the store dir
    // missing with the data in its siblings — complete or roll back
    // before anything reads (single writer; the ingest IS that writer)
    Compaction.recover(s"$root/phash/store")
    Compaction.recover(s"$root/pairs/store")
    val ph = MediaFunctions.perceptualHash(
      b.as[MediaRow](Encoders.product[MediaRow])).toDF()
      .withColumn("batch_id", lit(id))
      .persist()
    try {
      ph.write.mode(SaveMode.Overwrite).parquet(s"$root/phash/batch=$id")
      val storeBefore = accumulated(s, s"$root/phash")
        .filter(col("batch_id") < id)
      writePairs(ph, storeBefore, maxHamming,
        s"$root/pairs/batch=$id")
      if (auditCadence > 0)
        BandSkewReport.maintainPhashEvery(
          accumulated(s, s"$root/phash")
            .filter(col("batch_id") <= id)
            .select(col("phash").as("h64")),
          s"$root/phash_audit", id, auditCadence)
      if (compactCadence > 0 && (id + 1) % compactCadence == 0) {
        fold(s, s"$root/phash", id, "mediaId", compactTargetFiles)
        fold(s, s"$root/pairs", id, "a_id", compactTargetFiles)
      }
      ()
    } finally { ph.unpersist(); () }
  }

  /** Fold `store ∪ {batch dirs with watermark < id ≤ upTo}` into one
    * sorted store generation (range-partitioned + sorted on `sortCol`,
    * so files own disjoint key ranges and parquet min/max stats prune
    * point lookups — [[Compaction.compactSorted]]'s discipline), with
    * the new watermark committed in the SAME atomic swap. Folded and
    * stale (replayed-after-fold) batch dirs are garbage-collected after
    * the swap — a crash mid-GC is harmless because readers ignore every
    * dir with id ≤ watermark.
    */
  private def fold(s: SparkSession, base: String, upTo: Long,
    sortCol: String, targetFiles: Int): Unit = {
    val w = watermark(base)
    val live = tailDirs(base).filter { case (i, _) => i > w && i <= upTo }
    if (live.nonEmpty) {
      val parts = (if (w >= 0) Seq(s"$base/store") else Nil) ++ live.map(_._2)
      Compaction.swapIn(s"$base/store",
        s.read.parquet(parts: _*)
          .repartitionByRange(targetFiles, col(sortCol))
          .sortWithinPartitions(sortCol),
        Map(WatermarkFile -> upTo.toString))
    }
    val wNow = watermark(base)
    tailDirs(base).filter(_._1 <= wNow)
      .foreach { case (_, p) => rmTree(p) }
  }

  /** Highest folded batch id (−1: no store yet). A store dir WITHOUT the
    * sidecar can only be a partial FIRST fold promoted by
    * [[Compaction.recover]] (the sidecar is written after the parquet
    * commit, and every non-first swap starts from a sidecar-bearing
    * store): its source batch dirs are still on disk — GC runs only
    * after a complete swap — so the partial store is dropped and the
    * tail remains authoritative.
    */
  private def watermark(base: String): Long = {
    val store = Paths.get(base, "store")
    if (!Files.exists(store)) -1L
    else {
      val p = store.resolve(WatermarkFile)
      if (Files.exists(p)) Files.readString(p).trim.toLong
      else { rmTree(store.toString); -1L }
    }
  }

  /** (batch id, path) of every live `batch=<id>` dir under `base`. */
  private def tailDirs(base: String): Seq[(Long, String)] = {
    val p = Paths.get(base)
    if (!Files.exists(p)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val ls = Files.list(p)
      try ls.iterator().asScala
        .filter(_.getFileName.toString.startsWith("batch="))
        .flatMap(d => d.getFileName.toString.drop(6).toLongOption
          .map(_ -> d.toString))
        .toSeq.sortBy(_._1)
      finally ls.close()
    }
  }

  private def rmTree(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally walk.close()
    }
  }

  /** The accumulated view a reader (or the per-batch cohort join) sees:
    * the folded store generation plus the unfolded tail — O(cadence)
    * paths, never O(stream length).
    */
  private def accumulated(s: SparkSession, base: String): DataFrame = {
    val w = watermark(base)
    val parts = (if (w >= 0) Seq(s"$base/store") else Nil) ++
      tailDirs(base).filter(_._1 > w).map(_._2)
    s.read.parquet(parts: _*)
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
    accumulated(s, s"$root/pairs")

  /** The accumulated fingerprint store. */
  def phashes(s: SparkSession, root: String): DataFrame =
    accumulated(s, s"$root/phash")
}
