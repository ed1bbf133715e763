package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-corpus ingestion sources: JSONL and CSV document dumps (the wire
  * formats crawl corpora actually arrive in) decoded to the engine's
  * `documents` schema with an explicit corrupt-record QUARANTINE — a 100 TB
  * ingest cannot abort on the one malformed line in shard 40 000, and it
  * cannot silently drop it either.
  *
  * Design rules, mirrored from `chain.BlockSource` (the node-JSON source):
  *   - EXPLICIT schema, never inference — inference is a full extra pass
  *     over 100 TB and a schema-drift time bomb (a batch whose optional
  *     field is all-null infers a different type than yesterday's).
  *   - PERMISSIVE decode with a corrupt-record capture column: well-formed
  *     rows project to the documents schema (missing optional fields
  *     null-fill, unknown extra fields are ignored — additive producer
  *     drift never breaks the reader); malformed rows land in a quarantine
  *     directory VERBATIM for replay after a decoder fix.
  *   - The split is one narrow pass per side off a cached decode (Spark
  *     requires referencing rows besides the corrupt column when filtering
  *     on it; the cache also keeps the 100 TB scan at two map-side passes,
  *     not a re-decode per consumer).
  */
object CorpusSource {

  /** The engine's documents schema; `n_chars` is derived when absent. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val Corrupt = "_corrupt_record"
  private val readSchema = schema.add(StructField(Corrupt, StringType))

  /** Decoded good rows + the quarantine frame (raw line, reason). */
  case class Decoded(docs: DataFrame, quarantined: DataFrame)

  /** JSONL corpus dump → documents frame + quarantine.
    *
    * @param quarantineDir if set, malformed raw lines land there as text
    *                      under a content-addressed per-input-path subdir
    *                      (overwritten whole — idempotent under retries)
    *                      before the good frame returns.
    */
  def fromJsonl(spark: SparkSession, path: String,
    quarantineDir: Option[String] = None): Decoded = {
    val raw = spark.read
      .schema(readSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
      .cache()
    split(raw, path, quarantineDir, "jsonl decode failed")
  }

  /** CSV corpus dump (with header) → documents frame + quarantine. */
  def fromCsv(spark: SparkSession, path: String,
    quarantineDir: Option[String] = None): Decoded = {
    val raw = spark.read
      .schema(readSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .csv(path)
      .cache()
    split(raw, path, quarantineDir, "csv decode failed")
  }

  private def split(raw: DataFrame, path: String,
    quarantineDir: Option[String], reason: String): Decoded = {
    // a row is quarantined if the parser flagged it OR it lacks the two
    // REQUIRED fields (doc_id, text) — "parsed but useless" is corrupt too
    val bad = raw.filter(
      col(Corrupt).isNotNull || col("doc_id").isNull || col("text").isNull)
      .select(coalesce(col(Corrupt),
        to_json(struct(schema.fieldNames.map(col): _*))).as("raw_line"),
        lit(reason).as("reason"))
    // idempotent quarantine: each INPUT PATH owns a content-addressed
    // subdir, overwritten whole — a failed-and-retried ingest (or a
    // caller decoding the same dump twice) can never double-count the
    // replay queue (the same at-least-once contract as the streaming
    // writers' per-batchId dirs)
    quarantineDir.foreach { d =>
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(path.getBytes("UTF-8")).map("%02x".format(_)).mkString
      bad.select("raw_line").write.mode("overwrite").text(s"$d/src=$key")
    }
    val good = raw.filter(
      col(Corrupt).isNull && col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        coalesce(col("n_chars"), length(col("text")).cast("long")).as("n_chars"))
    Decoded(good, bad)
  }
}
