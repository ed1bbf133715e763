package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: drive the STREAMING curation pipeline (clean gate →
  * near-dup pairing → incremental dup-cluster labels, i.e.
  * `StreamingPipeline.cleanDupClusters`) over a corpus directory as a real
  * file stream, and report wall time + docs/s — the scale-proof companion
  * of the batch TimeQueries runs, exercising the stateful path (RocksDB
  * state store, cross-batch LSH cohorts, bucketed label store) at sf1/sf10
  * data sizes.
  *
  * Usage: runMain graft.StreamCurationBench <sfDir> [maxFilesPerTrigger]
  */
object StreamCurationBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamCurationBench <sfDir> [maxFilesPerTrigger]")
    val sfDir = args(0)
    val perTrigger = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the file stream source requires a DIRECTORY; the driver's sf dirs
    // ship documents.parquet as a single file — stage a symlink dir
    val raw = java.nio.file.Paths.get(s"$sfDir/documents.parquet")
    val src =
      if (java.nio.file.Files.isDirectory(raw)) raw.toString
      else {
        val d = java.nio.file.Files.createTempDirectory("graft-scur-src")
        java.nio.file.Files.createSymbolicLink(
          d.resolve("part-0.parquet"), raw)
        d.toString
      }
    val schema = spark.read.parquet(src).schema
    val nDocs = spark.read.parquet(src).count()
    val work = java.nio.file.Files.createTempDirectory("graft-scur").toString
    val clusters = new streaming.StreamingDupClusters(s"$work/clusters")
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", perTrigger)
      .parquet(src)
      .select(col("doc_id").as("docId"), col("text"))
      .as[streaming.StreamingCleanExport.Doc]
    // the SAME screens as batch q108 — shared constants, not restated
    // literals (r08 ADVICE)
    val t0 = System.nanoTime()
    val query = streaming.StreamingPipeline.cleanDupClusters(
      docs, queries.TextQueries.Blocklist, queries.DedupQueries.QualityMin,
      clusters, s"$work/ckpt")
    query.processAllAvailable()
    query.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    val labels = clusters.labels(spark).count()
    println(f"""{"metric":"stream_curation","sf_dir":"$sfDir","docs":$nDocs,""" +
      f""""seconds":$secs%.2f,"docs_per_s":${nDocs / secs}%.1f,"labeled":$labels}""")
    spark.stop()
  }
}
