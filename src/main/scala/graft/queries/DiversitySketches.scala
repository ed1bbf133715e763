package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** INGEST-TIME distinct-stat sketches for the corpus-wide diversity
  * queries (r14 verdict item 1 — the reference's spent-at-index-time
  * philosophy, readme.md:14-16 / `PersistentRepo.scala:49`, applied to
  * the curation tier): q156/q166 answer a corpus-LEVEL statistic
  * (distinct n-grams per source) by rescanning the whole gram mass every
  * run — correct, linear by necessity per run, but at 100 TB "rescan per
  * run" vs "merge per-shard sketches" is hours vs seconds.
  *
  * This tier pays the scan ONCE, on the warehouse cadence: per ingest
  * bucket (a doc_id range — the unit a micro-batch or a compaction
  * rewrite owns), per (source, n), one Datasketches HLL sketch of the
  * gram keys plus the exact gram count is materialized as a row of a
  * tiny SKETCH TABLE (~buckets × sources × 3 rows, each ~2^LgK bytes).
  * The timed query (q169) is then a sketch-UNION merge over that table —
  * metadata-scale, independent of the corpus text.
  *
  * Merge semantics, stated precisely (Round15Spec pins each):
  *  - the union is ORDER-INDEPENDENT: the merged state is a pure function
  *    of the SET of sketch rows (register max-merge / coupon set-union),
  *    so shuffle order and re-reads can never move the answer;
  *  - a bucket wholly owned by one micro-batch appends the byte-identical
  *    sketch row the batch materializer writes — aligned stream == batch
  *    EXACTLY;
  *  - a bucket SPLIT across micro-batches yields partial rows whose union
  *    estimate may differ from the single-pass sketch within the sketch's
  *    own RSE (a Datasketches union result drops the HIP estimator for
  *    the composite one — inherent to mergeability, not to this code);
  *    total_grams stays exact under any split because counts are plain
  *    sums;
  *  - every form sits within HLL error of the exact q156 census, which
  *    stays as the oracle-bound companion.
  *
  * Gram enumeration and hashing ride [[TextQueries.sketchGramsOf]] — the
  * SAME filter/sequence/slice geometry as q156/q166, so the three
  * surfaces can never diverge on what a "gram" is.
  */
object DiversitySketches {

  /** Ingest-bucket width (docs per sketch row). At the bench scales:
    * sf0.01 → 1 bucket, sf10 (500k docs) → ~123 buckets; at 10^10 docs
    * the sketch table is ~2.4M rows × ~4 KB — still metadata-scale next
    * to the corpus. Folded into the gram stream as integer `div`, so the
    * bucket of a doc never depends on batch boundaries.
    */
  val BucketDocs = 4096L

  /** Datasketches HLL lgConfigK (2^12 registers ≈ 1.6% RSE) — one
    * constant on every path (writer, streaming appender, union) because
    * union at MIXED lgK degrades to the coarser sketch and would break
    * the byte-identical merge law Round15Spec pins.
    */
  val LgK = 12

  /** Sketch rows for an arbitrary slice of the corpus — the batch
    * materializer maps the whole table through this once; the streaming
    * appender maps each micro-batch. (bucket, source, n) → exact gram
    * count + HLL sketch binary.
    */
  private[graft] def sketchRows(docsSlice: DataFrame): DataFrame =
    TextQueries.sketchGramsOf(docsSlice)
      .groupBy("bucket", "source", "n")
      .agg(count(lit(1)).as("total_grams"),
        hll_sketch_agg(col("gh"), lit(LgK)).as("sketch"))

  /** The consumer: union-merge a sketch table back to the q156/q166
    * surface — (source, n, total_grams, distinct_grams, diversity).
    * Shuffles only sketch ROWS (keyed by (source, n)); the gram mass
    * never appears.
    */
  def merged(sketchTable: DataFrame): DataFrame =
    sketchTable.groupBy("source", "n")
      .agg(sum("total_grams").as("total_grams"),
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_grams"))
      .withColumn("diversity",
        round(col("distinct_grams").cast("double") / col("total_grams"), 6))
      .orderBy("source", "n")

  /** Publish the batch-built sketch table under `out/v=<k>` with the
    * house atomic-rename claim (CorpusBuild.run's crash/concurrency
    * discipline); returns the published path.
    */
  def materialize(s: SparkSession, dir: String, out: String): String = {
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(s.sessionState.newHadoopConf())
    fs.mkdirs(outPath)
    val tmp = new org.apache.hadoop.fs.Path(outPath,
      s"_tmp_${java.util.UUID.randomUUID()}")
    sketchRows(graft.Tables.load(s, dir, "documents"))
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val next = latest(s, out)
      .flatMap(_.split("=").last.toLongOption).map(_ + 1).getOrElse(0L)
    val (dest, _) = graft.GraftEngine.claimVersion(fs, outPath, tmp, next)
    // GC with a keep window of newest−2 (three versions): a
    // re-materializing session would otherwise leak one ~MB dir per run.
    // The window is TWO swaps deep, not one (r15 ADVICE): table()'s
    // exists() check races the actual parquet scan, so a reader holding
    // newest−1 must survive one MORE concurrent re-materialization before
    // its version can vanish mid-query — two full materialize cycles of
    // grace instead of one narrows the race to sessions that lag two
    // whole corpus scans behind.
    val kept = dest.getName.stripPrefix("v=").toLong
    fs.listStatus(outPath).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("v=") &&
        p.getName.drop(2).toLongOption.exists(_ < kept - 2))
      .foreach(p => fs.delete(p, true))
    dest.toString
  }

  /** Newest fully-published sketch-table version under `out`. */
  def latest(s: SparkSession, out: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).flatMap(_.drop(2).toLongOption)
      .sorted.lastOption.map(v => s"$out/v=$v")
  }

  // q169's per-(session, sf dir) table: materialized ONCE per session
  // (the perpScores fit-once precedent — building it is warehouse
  // population, Bench warms it untimed) to a stable location under the
  // session's warehouse dir, then every q169 run READS the published
  // parquet — the timed region is honestly "merge per-shard sketches
  // from the warehouse", the production shape.
  private val tableMemo =
    scala.collection.concurrent.TrieMap[(SparkSession, String), String]()
  Memos.register(s => tableMemo.keys.filter(_._1 eq s)
    .foreach(tableMemo.remove))

  private[graft] def table(s: SparkSession, dir: String): String = {
    // validate a memoized path before serving it: a concurrent session
    // re-materializing the same root can GC the version this session
    // memoized (GC keeps only newest+1), so a vanished path transparently
    // re-materializes instead of failing the read mid-session (r15
    // review finding)
    tableMemo.get((s, dir)).filter(exists(s, _)).getOrElse {
      tableMemo.remove((s, dir))
      tableMemo.getOrElseUpdate((s, dir), {
        Memos.hook(s)
        val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
        val root = s.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
          s"/_graft_diversity_sketches/$safe"
        materialize(s, dir, root)
      })
    }
  }

  private def exists(s: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sessionState.newHadoopConf()).exists(p)
  }
}
