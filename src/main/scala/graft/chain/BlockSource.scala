package graft.chain

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Block sources (SURVEY.md §2.1 S2/S3): JSON-lines block files (gzip or
  * plain — Spark's text/json sources decompress by codec extension
  * automatically, like the reference's gunzip source BlockReader.scala:26-40)
  * decoded against the explicit RawBlock schema — no inference in production
  * (§1.1) — with the height offset pushed into the scan.
  */
object BlockSource {

  val schema = Encoders.product[RawBlock].schema

  /** S3: batch backfill from block line files; `fromHeight` prunes at the
    * source (the `dropUntil` analog, predicate-pushed).
    */
  def fromJsonLines(spark: SparkSession, path: String, fromHeight: Int = 0): Dataset[RawBlock] = {
    import spark.implicits._
    spark.read.schema(schema).json(path)
      .filter(col("header.height") >= fromHeight)
      .as[RawBlock]
  }

  /** S1/S4-adjacent helper: write a block set as JSON lines (test fixtures
    * and the hand-off format from any out-of-engine fetcher — the node HTTP
    * pool stays outside the engine, §2.9 ST8).
    */
  def writeJsonLines(blocks: Dataset[RawBlock], path: String): Unit =
    blocks.toJSON.write.mode("overwrite").text(path)
}
