package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The terminal MATERIALIZER: compose the pipeline's oracle-checked
  * verdicts into an actual on-disk training corpus a trainer mounts
  * directly — what every query up to here exists to feed.
  *
  *   1. keep verdicts (q108: exact dedup ∘ near-dup components ∘
  *      blocklist ∘ quality floor) pick the surviving documents;
  *   2. leakage-free split routing (q126: docs route by their dup-cluster
  *      representative, so no near-dup family straddles train/val/test);
  *   3. balanced shard assignment within each (split, source) — the q136
  *      ±1 law applied per split: round-robin in doc_id order, so shard
  *      doc counts per source differ by ≤ 1 and every shard is an
  *      unbiased sample of the split's source mix. doc_id order (not
  *      q136's hash order) is deliberate: it makes the assignment a
  *      MONOTONE FRONTIER — rank only ever appends — so the streaming
  *      twin ([[graft.streaming.StreamingCorpusBuild]]) can extend a
  *      published corpus incrementally with the StreamingPacking
  *      late-flag contract, where a hash-ordered rank would reshuffle
  *      every already-written doc on each arrival;
  *   4. context-window chunking (q131's exact geometry) of each kept doc;
  *   5. one partitioned parquet write: `out/split=…/shard=…/…` — readers
  *      (and the trainer's data loader) prune to a split or a shard at
  *      the directory level — plus a `_manifest` parquet of per-shard
  *      doc/chunk/token/source counts (`_`-prefixed: invisible to a
  *      plain read of `out`).
  *
  * Scale shape: the verdict/split/doc joins are doc_id equi-joins; the
  * only new exchange is the per-(split, source) round-robin window (each
  * source's extent, never the corpus) and the write's own partitioning.
  * Chunking is strictly narrow. Nothing here adds a corpus-wide sort or
  * an unkeyed join to the already-bounded component plans.
  */
object CorpusBuild {

  /** Chunk-row column order shared by [[run]]'s write and the streaming
    * appender — the two materializers must emit identical tables.
    */
  private[graft] val ChunkCols =
    Seq("doc_id", "chunk_idx", "chunk_text", "chunk_tokens",
      "source", "lang", "split", "shard")

  /** Newest fully-published corpus version under `out` (None before the
    * first successful [[run]]). Every `v=` dir is complete by
    * construction — versions are claimed by atomic rename, and half-built
    * `_tmp_*` dirs are never eligible.
    */
  def latest(s: SparkSession, out: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).flatMap(_.drop(2).toLongOption)
      .sorted.lastOption.map(v => s"$out/v=$v")
  }

  /** Build the corpus and PUBLISH it as `out/v=<k>` — the same
    * crash/concurrency discipline as the catalog snapshots: the whole
    * partitioned tree (and its `_manifest`) is written to a unique
    * `_tmp_*` dir first and claimed by ATOMIC RENAME, so a reader of
    * [[latest]] never sees a torn corpus and a crashed build leaves only
    * an invisible temp dir. Returns the manifest (split, shard, n_docs,
    * n_chunks, n_tokens, n_sources) read from the published version.
    */
  def run(s: SparkSession, dir: String, out: String,
    numShards: Int = AssemblyQueries.NumShards): DataFrame = {
    val kept = DedupQueries.queries("q108_clean_export")(s, dir)
      .filter(col("reason") === "kept").select("doc_id")
    val splits = DedupQueries.queries("q126_cluster_split")(s, dir)
      .select("doc_id", "split")
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), toks(col("text")).as("tk"))
      .join(kept, "doc_id")
      .join(splits, "doc_id")
    val w = Window.partitionBy("split", "source").orderBy(col("doc_id"))
    val sharded = d
      .withColumn("shard", ((row_number().over(w) - 1) % numShards).cast("long"))
    val chunks = AssemblyQueries.chunkify(
      sharded.select(col("doc_id"), col("tk"),
        col("source"), col("lang"), col("split"), col("shard")))

    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(s.sessionState.newHadoopConf())
    fs.mkdirs(outPath)
    val tmp = new org.apache.hadoop.fs.Path(outPath,
      s"_tmp_${java.util.UUID.randomUUID()}")
    chunks.write.mode(SaveMode.Overwrite)
      .partitionBy("split", "shard").parquet(tmp.toString)

    // manifest derived from what was WRITTEN, not from the plan — the
    // consistency readers rely on is between these files and this summary
    def manifestOf(path: String): DataFrame = s.read.parquet(path)
      // partition-column type inference reads `shard=N` back as int —
      // pin the manifest schema to the long the writer assigned
      .groupBy(col("split"), col("shard").cast("long").as("shard"))
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum("chunk_tokens").as("n_tokens"),
        countDistinct("source").as("n_sources"))
      .orderBy("split", "shard")
    manifestOf(tmp.toString).write.mode(SaveMode.Overwrite)
      .parquet(s"$tmp/_manifest")

    val next = latest(s, out)
      .flatMap(_.split("=").last.toLongOption).map(_ + 1).getOrElse(0L)
    // lost race ⇒ adopt the winner's fully-written version (builds are
    // deterministic per corpus, same contract as the snapshot swap)
    val (dest, _) = graft.GraftEngine.claimVersion(fs, outPath, tmp, next)
    s.read.parquet(s"$dest/_manifest")
  }
}
