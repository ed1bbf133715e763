package graft.chain

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed warehouse layout (SURVEY.md §4 — the Spark translation of the
  * reference's static secondary indexes on boxId/ergoTreeHash): writing the
  * two sides of the recurring UTXO joins bucketed-and-sorted by their join
  * key makes every later outputs⋈inputs / boxes⋈assets join shuffle-free —
  * the bucket files ARE the exchange, paid once at write time.
  *
  * At 100 TB this is the difference between re-shuffling multi-TB fact
  * tables per query and a sort-merge join that streams co-located bucket
  * pairs. Bucket count should be sized so a bucket's largest partition fits
  * an executor's memory (the `boxId` key is a uniform hash, so buckets are
  * balanced by construction).
  */
object Bucketing {

  /** Write `df` as a bucketed external table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
    bucketCol: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
