package graft.streaming

import graft.chain._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.file.{Files, Paths}

/** Streaming chain ingest (SURVEY.md §2.9 ST1–ST4): a Structured Streaming
  * source of raw blocks driven through `foreachBatch`, maintaining the
  * entity tables incrementally and the UTXO set as versioned snapshots.
  *
  * Design (vs the reference's MVStore/H2 pair, PersistentRepo.scala:58-73):
  *  - the COMMON path appends only the batch's own entity rows; cumulative
  *    stats are carried forward from the stored tip exactly like
  *    `BlockBuilder(prev)` — no re-scan of history per batch;
  *  - UTXO maintenance is the K2 delta: next = (current ∪ batch-outputs) ∖
  *    batch-inputs, written as a NEW versioned snapshot dir (MVCC revisions,
  *    MvStorage.scala:296-298 keeps 10) — fork rollback = rebuild from
  *    outputs ∖ inputs (J5), which is always possible (SURVEY §7.4 risk 2);
  *  - a FORK in a batch (incoming height ≤ stored tip) falls back to
  *    re-deriving from the resolved main chain; at warehouse scale that
  *    rewrite is a partition overwrite of `heightBucket ≥ fork bucket`, and
  *    the bucket column below partitions every entity table by
  *    height/10000 (the reference's compaction cadence) to make that cheap.
  *
  * Checkpointing replaces the reference's Initializer integrity check: the
  * source offset and the tables advance together in foreachBatch, and
  * reprocessing a batch is idempotent (a redelivered batch lands on the
  * fork path, which rebuilds from id-deduped raw; [[heal]] covers the
  * crash window between the raw append and the entity writes).
  */
class ChainIngest(val warehouse: String, keepVersions: Int = 10) {

  private def p(name: String) = s"$warehouse/$name"
  private def exists(name: String) = Files.exists(Paths.get(p(name)))

  /** Height-bucket partition column (application.conf compaction cadence). */
  private def withBucket(df: DataFrame, heightCol: String): DataFrame =
    df.withColumn("heightBucket",
      floor(col(heightCol) / ChainConst.HeightBucketSize).cast("int"))

  def start(spark: SparkSession, sourceDir: String, checkpoint: String,
    trigger: Trigger = Trigger.ProcessingTime("5 seconds") /* ST1 cadence */): StreamingQuery =
    spark.readStream
      .schema(Encoders.product[RawBlock].schema)
      .json(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        import df.sparkSession.implicits._
        processBatch(df.as[RawBlock], batchId)
      }
      .start()

  /** The per-batch pipeline — public so tests (and backfills) can drive it
    * directly (ST2).
    */
  def processBatch(batch: Dataset[RawBlock], batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    batch.toDF().write.mode(SaveMode.Append).parquet(p("raw"))

    val tip: Option[org.apache.spark.sql.Row] =
      if (exists("blocks"))
        spark.read.parquet(p("blocks")).orderBy(desc("height")).limit(1)
          .collect().headOption
      else None

    // one aggregate pass over the batch: lowest height, duplicate-height
    // detection, and the lowest block's timestamp (min over (height, ts)
    // structs — deterministic under same-height forks, unlike a sort+take).
    val stats = batch.toDF().select(
      min(col("header.height")).as("minH"),
      count(lit(1)).as("n"),
      countDistinct(col("header.height")).as("nh"),
      min(struct(col("header.height"), col("header.timestamp")))
        .getField("timestamp").as("firstTs")).head()
    val minBatchHeight = stats.getAs[Int]("minH")
    val hasInBatchFork = stats.getAs[Long]("n") != stats.getAs[Long]("nh")
    // ST3: fork vs the stored tip, OR competing same-height blocks inside
    // the batch itself — both resolve through the raw rebuild.
    val isFork = hasInBatchFork || tip.exists(t => minBatchHeight <= t.getAs[Int]("height"))

    if (isFork) reprocessFromRaw(spark)
    else appendIncremental(batch, tip, minBatchHeight,
      if (stats.isNullAt(3)) None else Some(stats.getAs[Long]("firstTs")))
  }

  /** Common path: derive the batch alone, shift cumulative/global columns by
    * the stored tip's totals, append.
    */
  private def appendIncremental(
    batch: Dataset[RawBlock], tip: Option[org.apache.spark.sql.Row],
    minBatchHeight: Int, firstTs: Option[Long]): Unit = {
    val spark = batch.sparkSession
    val t = BlockDerivation.derive(batch)

    val (txBase, boxBase) = tip
      .map(r => (r.getAs[Long]("maxTxGix") + 1, r.getAs[Long]("maxBoxGix") + 1))
      .getOrElse((0L, 0L))
    val offsets = Map(
      "blockChainTotalSize" -> "blockChainTotalSize", "totalTxsCount" -> "totalTxsCount",
      "totalMiningTime" -> "totalMiningTime", "totalFees" -> "totalFees",
      "totalMinersReward" -> "totalMinersReward", "totalCoinsInTxs" -> "totalCoinsInTxs")

    val blocksShifted0 = offsets.foldLeft(t.blocks) { case (df, (c, _)) =>
      tip.map(r => df.withColumn(c, col(c) + r.getAs[Long](c))).getOrElse(df)
    }
      .withColumn("maxTxGix", col("maxTxGix") + txBase)
      .withColumn("maxBoxGix", col("maxBoxGix") + boxBase)
    // The batch's first block computed miningTime=0 (no lag row in-batch);
    // the true value is firstTs − tipTs, a per-batch constant folded into
    // both the lowest block's blockMiningTime and every row's cumulative.
    // Targeting the batch's OWN lowest height (not tip+1) keeps
    // totalMiningTime == tipTotal + Σ batch blockMiningTime even when the
    // source delivers a non-contiguous batch; a null tip/first timestamp
    // degrades to delta 0 rather than corrupting the cumulative.
    val blocksShifted = tip.map { r =>
      val firstDelta = firstTs.map(_ - r.getAs[Long]("timestamp")).getOrElse(0L)
      val firstH = col("height") === lit(minBatchHeight)
      blocksShifted0
        .withColumn("blockMiningTime",
          when(firstH, lit(firstDelta)).otherwise(col("blockMiningTime")))
        .withColumn("totalMiningTime", col("totalMiningTime") + firstDelta)
    }.getOrElse(blocksShifted0)

    withBucket(blocksShifted, "height").write.mode(SaveMode.Append)
      .partitionBy("heightBucket").parquet(p("blocks"))
    withBucket(t.txs.withColumn("globalIndex", col("globalIndex") + txBase), "height")
      .write.mode(SaveMode.Append).partitionBy("heightBucket").parquet(p("txs"))
    withBucket(t.outputs.withColumn("globalIndex", col("globalIndex") + boxBase),
      "settlementHeight")
      .write.mode(SaveMode.Append).partitionBy("heightBucket").parquet(p("outputs"))
    withBucket(t.inputs, "height").write.mode(SaveMode.Append)
      .partitionBy("heightBucket").parquet(p("inputs"))
    withBucket(t.assets, "height").write.mode(SaveMode.Append)
      .partitionBy("heightBucket").parquet(p("assets"))

    // K2 delta: next utxo = (current ∪ batch outputs) ∖ batch inputs.
    val batchOutputs = t.outputs
      .select("boxId", "txId", "blockId", "settlementHeight", "ergValue", "ergoTreeHash")
    val current =
      if (currentUtxoVersion().isDefined) spark.read.parquet(utxoPath(currentUtxoVersion().get))
      else spark.emptyDataFrame.to(batchOutputs.schema)
    val next = current.unionByName(batchOutputs)
      .join(t.inputs.select("boxId"), Seq("boxId"), "left_anti")
    commitUtxoVersion(next)
  }

  /** Fork path: resolve the main chain over the full raw stream and rewrite.
    * (At warehouse scale: overwrite only heightBucket partitions ≥ the fork
    * bucket; rare by construction — depth ≤ 10.)
    */
  private def reprocessFromRaw(spark: SparkSession): Unit = {
    import spark.implicits._
    // a replayed batch (foreachBatch redelivery after a crash) appends its
    // raw blocks twice — dedupe by block id before resolving, so replay is
    // idempotent end-to-end.
    val raw = spark.read.parquet(p("raw"))
      .withColumn("_bid", col("header.id"))
      .dropDuplicates("_bid")
      .drop("_bid")
      .as[RawBlock]
    val resolved = ForkResolver.mainChain(raw)
    val t = BlockDerivation.derive(resolved)
    withBucket(t.blocks, "height").write.mode(SaveMode.Overwrite)
      .partitionBy("heightBucket").parquet(p("blocks"))
    withBucket(t.txs, "height").write.mode(SaveMode.Overwrite)
      .partitionBy("heightBucket").parquet(p("txs"))
    withBucket(t.outputs, "settlementHeight").write.mode(SaveMode.Overwrite)
      .partitionBy("heightBucket").parquet(p("outputs"))
    withBucket(t.inputs, "height").write.mode(SaveMode.Overwrite)
      .partitionBy("heightBucket").parquet(p("inputs"))
    withBucket(t.assets, "height").write.mode(SaveMode.Overwrite)
      .partitionBy("heightBucket").parquet(p("assets"))
    val rebuilt = UtxoQueries.utxos(t)
      .select("boxId", "txId", "blockId", "settlementHeight", "ergValue", "ergoTreeHash")
    commitUtxoVersion(rebuilt)
  }

  // ---- versioned UTXO snapshots (MVCC revisions) ----
  // Versions are a monotonic counter independent of batch ids: every commit
  // writes current+1, so a commit can never overwrite the snapshot its own
  // plan is lazily reading, and heal/backfill/stream interleavings stay
  // ordered. (A redelivered batch lands on the fork path — full rebuild —
  // so correctness never depends on version reuse.)

  private def utxoPath(v: Long) = p(s"utxo/v=$v")

  private def listVersions(): Seq[Long] = {
    val dir = Paths.get(p("utxo"))
    if (!Files.exists(dir)) Nil
    else {
      val stream = Files.list(dir)
      try stream.toArray.toSeq.map(_.toString).filter(_.contains("v="))
        .map(s => s.substring(s.lastIndexOf("v=") + 2).toLong).sorted
      finally stream.close()
    }
  }

  def currentUtxoVersion(): Option[Long] = listVersions().lastOption

  private def commitUtxoVersion(df: DataFrame): Unit = {
    val next = currentUtxoVersion().getOrElse(-1L) + 1
    df.write.mode(SaveMode.Overwrite).parquet(utxoPath(next))
    // retain only the last `keepVersions` revisions (rollbackTo window)
    listVersions().dropRight(keepVersions).foreach { v =>
      val victim = Paths.get(utxoPath(v))
      val walk = Files.walk(victim)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  /** Startup integrity check + self-heal (the Initializer.scala:15-37
    * analog): processBatch appends raw FIRST, then derives — a crash in
    * between leaves raw ahead of the tables. Detect by tip-height mismatch
    * and re-derive from (deduped) raw. Idempotent; returns whether healing
    * was needed.
    */
  def heal(spark: SparkSession): Boolean = {
    if (!exists("raw")) return false
    val rawTip = spark.read.parquet(p("raw"))
      .agg(org.apache.spark.sql.functions.max(col("header.height"))).head().getInt(0)
    val derivedTip =
      if (exists("blocks"))
        spark.read.parquet(p("blocks"))
          .agg(org.apache.spark.sql.functions.max(col("height"))).head().getInt(0)
      else -1
    if (rawTip != derivedTip) { reprocessFromRaw(spark); true }
    else false
  }

  def utxo(spark: SparkSession): DataFrame =
    currentUtxoVersion() match {
      case Some(v) => spark.read.parquet(utxoPath(v))
      case None => throw new IllegalStateException("no utxo snapshot yet")
    }

  def blocks(spark: SparkSession): DataFrame = spark.read.parquet(p("blocks"))
}
