package graft.streaming

import graft.queries.{AssemblyQueries, CorpusBuild}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger}

/** The INCREMENTAL corpus materializer — the streaming twin of batch
  * [[CorpusBuild.run]], closing the last batch-only gap in the pipeline
  * story (r11 verdict item 7): curation verdicts and split routes are
  * already maintained incrementally (`StreamingPipeline.curationVerdicts`,
  * `StreamingDupClusters.splitAssignments`); this operator turns their
  * kept stream into the SAME on-disk corpus — `split=…/shard=…` chunk
  * files, per-shard manifest, atomic versioned publish — batch by batch.
  *
  * Shard assignment is a FRONTIER, not a window: batch CorpusBuild
  * round-robins rank-in-doc_id-order within (split, source), and doc_id
  * order is monotone under append-only ingest, so ONE (maxDocId, nextRank)
  * record per (split, source) in the RocksDB state store reproduces the
  * batch ranks exactly (StreamingPacking's contract, same late-flag rule:
  * a doc arriving at or behind its domain's frontier CANNOT take a rank
  * incrementally — it is surfaced under `_late/`, state untouched, never
  * silently mis-sharded).
  *
  * Publish model (how "incremental" and "atomic versions" coexist): chunk
  * DATA files are immutable per micro-batch — `data/batch=<id>/split=…/
  * shard=…` written once, idempotently overwritten on an at-least-once
  * replay of the SAME batch — while each `v=<k>` dir holds only METADATA:
  * the list of data batches it comprises (`_files`), the per-(split,
  * shard, source) running counts (`_manifest_src`, additive across
  * batches), and the reader-facing `_manifest` in batch CorpusBuild's
  * exact schema. A publish therefore costs O(micro-batch) + O(manifest),
  * never a corpus rewrite, and [[CorpusBuild.latest]]'s atomic-rename
  * version claim gives readers the same never-torn contract as batch
  * builds. `read` mounts the newest version's file list as one DataFrame.
  *
  * Scale shape: state is bytes per (split, source) domain; each publish
  * touches this batch's rows plus the (split × shard × source)-sized
  * manifest; nothing re-reads published data.
  */
object StreamingCorpusBuild {

  /** One kept document with its routed split — the composition point:
    * `curationVerdicts` (keep + split) joined back to the document text,
    * see [[splitDocs]].
    */
  case class SplitDoc(docId: Long, source: String, lang: String,
    split: String, text: String)

  /** Per-(split, source) round-robin frontier. */
  case class ShardState(maxDocId: Long, nextRank: Long)

  /** A doc with its assigned shard; `late = true` (shard = −1) when it
    * arrived at or behind the frontier and must re-pack offline.
    */
  case class ShardAssign(docId: Long, source: String, lang: String,
    split: String, shard: Long, late: Boolean, text: String)

  private[streaming] class ShardProcessor(numShards: Int)
    extends StatefulProcessor[(String, String), SplitDoc, ShardAssign] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[ShardState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ShardState](
        "shardState", Encoders.product[ShardState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (String, String), it: Iterator[SplitDoc],
      tv: TimerValues): Iterator[ShardAssign] = {
      val batch = it.toSeq.sortBy(_.docId)
      var s = if (st.exists()) st.get() else ShardState(-1L, 0L)
      val out = batch.map { d =>
        if (d.docId <= s.maxDocId)
          ShardAssign(d.docId, d.source, d.lang, d.split, -1L,
            late = true, d.text)
        else {
          val sh = s.nextRank % numShards
          s = ShardState(d.docId, s.nextRank + 1)
          ShardAssign(d.docId, d.source, d.lang, d.split, sh,
            late = false, d.text)
        }
      }
      st.update(s)
      out.iterator
    }
  }

  /** Assign every arriving kept doc its shard — rank-in-doc_id-order %
    * numShards per (split, source), the exact batch CorpusBuild rule.
    */
  def assignShards(docs: Dataset[SplitDoc],
    numShards: Int = AssemblyQueries.NumShards): Dataset[ShardAssign] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => (d.split, d.source))
      .transformWithState(
        new ShardProcessor(numShards), TimeMode.None(), OutputMode.Append())
  }

  /** Materialization-time input: the incrementally-maintained verdict
    * surface (doc_id, keep, reason, split — `curationVerdicts`' shape)
    * joined back to the document table, kept docs only.
    */
  def splitDocs(s: SparkSession, verdicts: DataFrame,
    documents: DataFrame): Dataset[SplitDoc] = {
    import s.implicits._
    documents.select(col("doc_id"), col("source"), col("lang"), col("text"))
      .join(verdicts.filter(col("keep") === 1).select("doc_id", "split"),
        "doc_id")
      .select(col("doc_id").as("docId"), col("source"), col("lang"),
        col("split"), col("text"))
      .as[SplitDoc]
  }

  /** An up-sampling plan pinned for a planned stream: the (source,
    * n_epochs, rem_rate) rows plus the md5 PLAN ID that stamps every
    * manifest row — a later run under a different plan is detectable row
    * by row (late-plan changes flag instead of silently mixing regimes).
    */
  case class PinnedPlan(planId: String,
    rows: Seq[(String, Long, Double)]) {
    def toDF(s: SparkSession): DataFrame = {
      import s.implicits._
      rows.toDF("source", "n_epochs", "rem_rate")
    }
  }

  /** Pin a q141-shaped plan frame (source, …, n_epochs, rem_rate): collect
    * the ~20-row dim (bounded by construction) and fingerprint its sorted
    * canonical rendering.
    */
  def pinPlan(plan: DataFrame): PinnedPlan = {
    val rows = plan.select("source", "n_epochs", "rem_rate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    val canon = rows.map { case (s, e, r) => s"$s:$e:$r" }.mkString("|")
    val id = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    PinnedPlan(id, rows)
  }

  /** Append one routed micro-batch's chunk files and publish the next
    * corpus version. Idempotent per batchId: the data dir is overwritten
    * whole, and a batch already listed in the newest version's `_files`
    * publishes nothing again. With a pinned plan, the per-doc copy-count
    * manifest (the loader contract q149 materializes in batch — the
    * corpus is never physically duplicated) lands under `plan/batch=…`,
    * each row stamped with the plan id.
    */
  private[graft] def appendBatch(s: SparkSession, batch: DataFrame,
    batchId: Long, out: String, plan: Option[PinnedPlan] = None): Unit = {
    // persist BEFORE the late/fresh split: the four downstream actions
    // (two isEmpty probes + two writes) would otherwise each re-execute
    // the stateful shard-assignment plan — 4× the batch's CPU/IO, and a
    // re-read of state-store versions foreachBatch reuse rules say to
    // avoid (the standard persist-on-reuse contract). When the caller
    // already holds a persist (route() does, to share the batch with its
    // sidecars), leave the caller's cache alone — unpersist() is not
    // ref-counted, and dropping it here would silently recompute the
    // stateful plan for every action the caller runs afterwards.
    val ownPersist =
      batch.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (ownPersist) batch.persist()
    try {
    val late = batch.filter(col("late"))
    if (!late.isEmpty)
      // surface, never corrupt: frontier regressions land in their own
      // `_`-dir (invisible to corpus readers) as the offline re-pack queue
      late.select(col("docId").as("doc_id"), col("source"), col("lang"),
          col("split"))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/_late/batch=$batchId")
    val fresh = batch.filter(!col("late"))
    if (!fresh.isEmpty) {
      val chunks = AssemblyQueries.chunkify(
        fresh.select(col("docId").as("doc_id"), toks(col("text")).as("tk"),
          col("source"), col("lang"), col("split"), col("shard")))
        .select(CorpusBuild.ChunkCols.map(col): _*)
      chunks.write.mode(SaveMode.Overwrite)
        .partitionBy("split", "shard").parquet(s"$out/data/batch=$batchId")
      // planned stream: the SAME expansion kernel as batch q149 over this
      // batch's fresh docs — O(batch) rows, idempotently overwritten
      plan.foreach { p =>
        AssemblyQueries.expandCopies(
          fresh.select(col("docId").as("doc_id"), col("source"),
            size(toks(col("text"))).cast("long").as("nt")),
          p.toDF(s))
          .withColumn("plan_id", lit(p.planId))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$out/plan/batch=$batchId")
      }
      publish(s, out, batchId)
    }
    } finally { if (ownPersist) batch.unpersist(); () }
  }

  /** The accumulated per-doc copy manifest of a planned stream (the q149
    * table, built batch by batch). Empty-schema exception if no planned
    * batch has landed yet.
    */
  def copyManifest(s: SparkSession, out: String): DataFrame =
    s.read.parquet(s"$out/plan/batch=*")

  /** Manifest rows written under an EARLIER plan than `current` — the
    * re-expansion queue after a late plan change (their copy counts
    * followed a regime the loader no longer runs).
    */
  def staleCopyDocs(s: SparkSession, out: String,
    current: PinnedPlan): DataFrame =
    copyManifest(s, out).filter(col("plan_id") =!= current.planId)

  private def publish(s: SparkSession, out: String, batchId: Long): Unit = {
    import s.implicits._
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(s.sessionState.newHadoopConf())
    fs.mkdirs(outPath)
    val prev = CorpusBuild.latest(s, out)
    val prevFiles = prev.map(p => s.read.parquet(s"$p/_files")
      .collect().map(_.getString(0)).toSeq).getOrElse(Seq.empty)
    val entry = s"batch=$batchId"
    if (prevFiles.contains(entry)) return // replayed batch: already published
    // counts from what was WRITTEN (batch CorpusBuild's discipline): the
    // consistency readers rely on is between the files and this summary
    val delta = s.read.parquet(s"$out/data/$entry")
      .groupBy(col("split"), col("shard").cast("long").as("shard"),
        col("source"))
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum("chunk_tokens").as("n_tokens"))
    // additive manifest: a doc takes exactly one non-late batch (the
    // frontier forbids repeats), so per-(split, shard, source) counts SUM
    val newSrc = prev.map(p => s.read.parquet(s"$p/_manifest_src"))
      .map(_.unionByName(delta)
        .groupBy("split", "shard", "source")
        .agg(sum("n_docs").as("n_docs"), sum("n_chunks").as("n_chunks"),
          sum("n_tokens").as("n_tokens")))
      .getOrElse(delta)
    val tmp = new org.apache.hadoop.fs.Path(outPath,
      s"_tmp_${java.util.UUID.randomUUID()}")
    (prevFiles :+ entry).toDF("dir").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/_files")
    newSrc.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$tmp/_manifest_src")
    s.read.parquet(s"$tmp/_manifest_src")
      .groupBy("split", "shard")
      .agg(sum("n_docs").as("n_docs"), sum("n_chunks").as("n_chunks"),
        sum("n_tokens").as("n_tokens"), count(lit(1)).as("n_sources"))
      .orderBy("split", "shard")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$tmp/_manifest")
    val next = prev.flatMap(_.split("=").last.toLongOption)
      .map(_ + 1).getOrElse(0L)
    graft.GraftEngine.claimVersion(fs, outPath, tmp, next)
    ()
  }

  /** The newest published corpus as one DataFrame — batch CorpusBuild's
    * reader contract over the incremental layout (the version's `_files`
    * name which immutable data batches participate).
    */
  def read(s: SparkSession, out: String): DataFrame = {
    val v = CorpusBuild.latest(s, out).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no published corpus version under $out"))
    val dirs = s.read.parquet(s"$v/_files")
      .collect().map(_.getString(0)).sorted
    s.read.option("basePath", s"$out/data")
      .parquet(dirs.map(d => s"$out/data/$d"): _*)
      .drop("batch")
  }

  /** The newest published manifest (batch CorpusBuild's schema). */
  def manifest(s: SparkSession, out: String): DataFrame = {
    val v = CorpusBuild.latest(s, out).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no published corpus version under $out"))
    s.read.parquet(s"$v/_manifest")
  }

  /** Start the appender: every micro-batch of kept docs is sharded at the
    * frontier, chunked (q131 geometry), written as an immutable data
    * batch, and published as the next atomic version. With a pinned
    * up-sampling plan, each batch also lands its per-doc copy-count
    * manifest (the streamed q149 — see [[copyManifest]]).
    */
  /** Optional maintenance sidecar for [[route]]: every `cadence` batches
    * the band-skew counters of `sfDir` are persisted under `auditOut`
    * (the K6 hot-key-report rhythm — see
    * [[graft.queries.BandSkewReport.maintainEvery]]; run id derives from
    * the batch id, so replays overwrite, never duplicate).
    */
  case class Maintenance(sfDir: String, auditOut: String, cadence: Long)

  /** With `sketchOut` set, every micro-batch ALSO lands its diversity-
    * sketch rows (r15 verdict item 2 — the spent-at-index-time rule
    * applied to the corpus the stream is actually building): the batch's
    * fresh docs run the SAME per-(bucket, source, n) HLL kernel the batch
    * materializer and [[StreamingDiversitySketch]] run, written
    * idempotently under `sketchOut/batch=<id>`. A production corpus then
    * has its sketch table AS IT BUILDS — q169's question answers from
    * `CorpusSurface.mountStreams(sketchesDir = …)` with zero corpus
    * rescan and zero materialize call in the reading session. Late docs
    * (shard −1, surfaced under `_late/`, not in the corpus) are NOT
    * sketched — the sketch table describes what corpus readers see; the
    * offline re-pack that admits them appends their rows.
    */
  def route(docs: Dataset[SplitDoc], out: String, checkpointDir: String,
    numShards: Int = AssemblyQueries.NumShards,
    trigger: Trigger = Trigger.AvailableNow(),
    plan: Option[PinnedPlan] = None,
    maintenance: Option[Maintenance] = None,
    sketchOut: Option[String] = None): StreamingQuery = {
    val s = docs.sparkSession
    assignShards(docs, numShards).toDF()
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        // one persist shared by appendBatch's actions AND the sidecars —
        // re-executing the transformWithState plan per action is both the
        // CPU and the state-store-reuse hazard appendBatch documents
        b.persist()
        try {
          appendBatch(s, b, id, out, plan)
          sketchOut.foreach { so =>
            graft.queries.DiversitySketches.sketchRows(
              b.filter(!col("late")).select(col("docId").as("doc_id"),
                col("source"), col("text")))
              .write.mode(SaveMode.Overwrite).parquet(s"$so/batch=$id")
          }
          maintenance.foreach(m => graft.queries.BandSkewReport
            .maintainEvery(s, m.sfDir, m.auditOut, id, m.cadence))
        } finally { b.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
