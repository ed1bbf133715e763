package graft.streaming

import org.apache.spark.sql.{SaveMode, SparkSession}

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Small-file compaction (SURVEY.md §2.9 ST4 — the reference compacts its
  * MVStore every 10,000 blocks, application.conf:49-57; a streaming parquet
  * warehouse accumulates one file set per micro-batch instead, and the read
  * path degrades with file count, not bytes).
  *
  * The swap is two renames (write tmp → move dir aside → move tmp in), so
  * it assumes a SINGLE WRITER and NO CONCURRENT READER of `dir` during the
  * swap — the ingest's maintenance window, exactly like the reference's
  * MVStore compaction. A crash between the renames leaves `dir` missing
  * with the data in the sibling dirs; [[recover]] (called automatically at
  * the start of every compaction, and available for startup) completes or
  * rolls back the interrupted swap. At cluster scale run per height-bucket
  * partition (only buckets with more than `targetFiles` files), which
  * bounds the rewrite to recent data.
  */
object Compaction {

  /** Repair an interrupted [[swapIn]]: if `dir` is missing, promote the
    * completed `.compact-tmp` (crash between the renames) or restore
    * `.compact-old`; if `dir` exists, clear leftover siblings. Returns
    * whether anything was repaired.
    */
  def recover(dir: String): Boolean = {
    val dirP = Paths.get(dir)
    val old = Paths.get(dir + ".compact-old")
    val tmp = Paths.get(dir + ".compact-tmp")
    if (!Files.exists(dirP) && Files.exists(tmp)) {
      Files.move(tmp, dirP); delete(old); true
    } else if (!Files.exists(dirP) && Files.exists(old)) {
      Files.move(old, dirP); true
    } else if (Files.exists(dirP) && (Files.exists(old) || Files.exists(tmp))) {
      delete(old); delete(tmp); true
    } else false
  }

  def fileCount(dir: String): Int = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) 0
    else {
      val walk = Files.walk(p)
      try walk.filter(f => f.toString.endsWith(".parquet")).count().toInt
      finally walk.close()
    }
  }

  def compact(spark: SparkSession, dir: String, targetFiles: Int = 4): Unit =
    swapIn(dir, spark.read.parquet(dir).coalesce(targetFiles))

  /** Sorted compaction (the "index later" phase of the reference's two-step
    * load, SURVEY §4): range-partition + sort within partitions on the
    * lookup key, so every file owns a disjoint key range and parquet min/max
    * statistics prune point/range scans to one file — the columnar stand-in
    * for the reference's post-load secondary indexes.
    */
  def compactSorted(spark: SparkSession, dir: String, sortCol: String,
    targetFiles: Int = 4): Unit = {
    import org.apache.spark.sql.functions.col
    swapIn(dir,
      spark.read.parquet(dir)
        .repartitionByRange(targetFiles, col(sortCol))
        .sortWithinPartitions(sortCol))
  }

  /** Z-ORDERED compaction — the MULTI-dimension twin of [[compactSorted]]:
    * quantize two lookup dimensions to 16 bits, Morton-interleave (the
    * same generated term list q144's layout audit reads), range-partition
    * + sort within partitions on the z-value. Every file then owns a
    * compact rectangle of the 2-D key space (~2^(−bits/2) of EACH range
    * per file) instead of a stripe of one dimension — parquet min/max
    * footer stats prune selective predicates on EITHER column. This is
    * the physical write q144 audits; the ranges fold as literals exactly
    * as there (at scale they come from table column stats, not a pass).
    */
  def compactZOrdered(spark: SparkSession, dir: String, dimX: String,
    dimY: String, targetFiles: Int = 16): Unit = {
    import org.apache.spark.sql.functions.{col, expr, max, min}
    val df = spark.read.parquet(dir)
    // cast the range probe to long so INT-typed dim columns don't CCE,
    // and no-op on an empty/all-null table instead of NPE'ing mid-swap
    val st = df.agg(min(col(dimX).cast("long")), max(col(dimX).cast("long")),
      min(col(dimY).cast("long")), max(col(dimY).cast("long"))).head()
    if (st.isNullAt(0) || st.isNullAt(2)) return
    val (xmin, xmax, ymin, ymax) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    val (xr, yr) = (math.max(1L, xmax - xmin), math.max(1L, ymax - ymin))
    // (dim − min) * 65535 overflows int64 past a ~1.4e14 range (e.g. micros
    // timestamps over a wide epoch span) and would produce garbage z-values
    // — a silently MIS-CLUSTERED layout. Fail loudly instead (the docLines
    // rank-guard house rule); such a dimension should be pre-bucketed
    // (days, not micros) before z-ordering. Ranges fold on the driver, so
    // the guard costs nothing per row.
    require(xr <= Long.MaxValue / 65535 && yr <= Long.MaxValue / 65535,
      s"compactZOrdered: dimension range too wide for 16-bit quantization " +
        s"(xr=$xr, yr=$yr, max=${Long.MaxValue / 65535}) — pre-bucket the " +
        "dimension (e.g. days instead of micros) before z-ordering")
    swapIn(dir,
      df.withColumn("__qx", expr(s"(($dimX - ${xmin}L) * 65535) div ${xr}L"))
        .withColumn("__qy", expr(s"(($dimY - ${ymin}L) * 65535) div ${yr}L"))
        .withColumn("__zv",
          expr(graft.queries.RelationalQueries.zInterleaveSpark("__qx", "__qy")))
        .repartitionByRange(targetFiles, col("__zv"))
        .sortWithinPartitions("__zv")
        .drop("__qx", "__qy", "__zv"))
  }

  /** The atomic-swap primitive, exposed (r17 verdict item 1) for stores
    * whose compaction must commit a METADATA file in the same atomic unit
    * as the rewritten data — the media route's fold watermark: `meta`
    * entries (name → content; names must start with '_' so parquet
    * readers skip them) are written into the tmp dir AFTER the data, so
    * the two renames publish data + meta together and a reader can never
    * observe a store whose watermark disagrees with its rows. `dir` may
    * not exist yet (first fold): the aside-move is skipped and the tmp
    * rename is the single commit point. Crash anywhere: [[recover]]
    * completes or rolls back, and a half-written tmp (data or meta) is
    * discarded because the renames only run after every write returned.
    */
  def swapIn(dir: String, df: org.apache.spark.sql.DataFrame,
    meta: Map[String, String] = Map.empty): Unit = {
    recover(dir)
    val tmp = dir + ".compact-tmp"
    val old = dir + ".compact-old"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    meta.foreach { case (name, content) =>
      require(name.startsWith("_"),
        s"meta file '$name' must start with '_' or parquet readers see it")
      Files.writeString(Paths.get(tmp, name), content)
    }
    val dirP = Paths.get(dir)
    if (Files.exists(dirP)) Files.move(dirP, Paths.get(old))
    Files.move(Paths.get(tmp), dirP)
    delete(Paths.get(old))
  }

  private def delete(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder()).forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
