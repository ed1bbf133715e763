package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED band-skew counters — K6 parity at the dedup tier (r14
  * verdict item 5): the reference persists its hot-key counters across
  * runs and ships the learned defaults (`SuperNodeCollector.scala:13-65`)
  * rather than re-measuring from scratch; the engine's analog of those
  * counters is the MinHash band-bucket occupancy/pair-mass audit that
  * sized the adaptive shard dial (`graft.BandAudit`, previously
  * dev-run-only). This object writes the same counters as a versioned
  * warehouse table on the maintenance cadence, so the dial's evidence
  * accumulates run over run and an operator (or an auto-tuner) reads it
  * with SQL via `CorpusSurface.mountStreams(bandAuditDir = …)`.
  *
  * Rows per run: for bits ∈ {0, adaptive} × each band — bucket count, max
  * occupancy, and Σ occ·(occ−1)/2 pair mass (the exact pre-distinct join
  * cost the banded self-join pays; integer arithmetic throughout). One
  * run is two passes over the cached signature table — compaction-cadence
  * cost, never per-query.
  */
object BandSkewReport {

  /** The counters for one corpus state: (bits, band, n_buckets, max_occ,
    * pair_mass, n_docs, adaptive_bits). `bits = 0` is the fixed-band
    * baseline; `bits = adaptive` is what production candidates ride —
    * their gap is the measured value of the dial.
    */
  def report(s: SparkSession, dir: String): DataFrame = {
    val nDocs = Tables.load(s, dir, "documents").count()
    val auto = DedupQueries.bandShardBits(nDocs)
    Seq(0, auto).distinct.map { bits =>
      DedupQueries.bucketOccupancy(s, dir, bits)
        .withColumn("bits", lit(bits))
    }.reduce(_ unionByName _)
      .withColumn("n_docs", lit(nDocs))
      .withColumn("adaptive_bits", lit(auto))
      .select("bits", "band", "n_buckets", "max_occ", "pair_mass",
        "n_docs", "adaptive_bits")
  }

  /** Write one run's counters under `out/run=<runId>`, idempotent per
    * run id: a re-write of the same run OVERWRITES its own dir — the
    * house at-least-once contract, which is why callers on a replayable
    * cadence must derive `runId` from their batch id (see
    * [[maintainEvery]]), never from directory state. Returns the run id.
    */
  def persist(s: SparkSession, dir: String, out: String, runId: Long): Long = {
    report(s, dir).coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$out/run=$runId")
    runId
  }

  /** Ad-hoc append (an operator running the report by hand): next free
    * run id from directory state. NOT replay-idempotent — streaming
    * callers must go through [[maintainEvery]].
    */
  def persist(s: SparkSession, dir: String, out: String): Long =
    persist(s, dir, out, nextRun(s, out))

  /** Maintenance-cadence hook for a streaming ingest's foreachBatch: runs
    * [[persist]] every `cadence` micro-batches (batch 0 included, so a
    * fresh pipeline has a report from its first maintenance window) —
    * the ChainIngest hot-key-report rhythm applied here. The run id is
    * `batchId / cadence`, a pure function of the batch, so an
    * at-least-once REPLAY of a batch overwrites its own run dir instead
    * of appending a duplicate (r15 review finding: deriving the id from
    * nextRun() double-counted a replayed maintenance batch).
    */
  def maintainEvery(s: SparkSession, dir: String, out: String,
    batchId: Long, cadence: Long): Option[Long] =
    if (cadence > 0 && batchId % cadence == 0)
      Some(persist(s, dir, out, batchId / cadence))
    else None

  private def nextRun(s: SparkSession, out: String): Long = {
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("run=")).flatMap(_.drop(4).toLongOption)
      .sorted.lastOption.map(_ + 1).getOrElse(0L)
  }

  /** All runs persisted so far (what the mounted view reads). */
  def runs(s: SparkSession, out: String): DataFrame =
    s.read.parquet(s"$out/run=*")
}
