package graft.sources

import graft.queries.Memos
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
  *   - JSONL decodes via text + `from_json`, so every quarantined row —
  *     malformed OR parsed-but-missing-required — keeps its raw input line
  *     VERBATIM for replay after a decoder fix (r12 ADVICE: the previous
  *     PERMISSIVE-reader form re-serialized the missing-required case
  *     through `to_json`, dropping unknown producer fields). Unknown extra
  *     fields are ignored by the explicit-schema parse — additive producer
  *     drift never breaks the reader.
  *   - CSV stays on the PERMISSIVE reader (header handling is the
  *     reader's). Its malformed rows quarantine verbatim via the corrupt
  *     column; a row that PARSES but lacks a required field is
  *     re-serialized through `to_json` — LOSSY by documented design (CSV
  *     quoting/field order cannot be reconstructed from parsed values; a
  *     replay-critical CSV ingest should convert to JSONL first).
  *   - The split is one narrow pass per side off a cached decode (the
  *     cache keeps the 100 TB scan at two map-side passes, not a re-decode
  *     per consumer). Caches are TRACKED: they unpersist via the Memos
  *     registry at application end or an explicit `evict`, instead of
  *     pinning one decode per ingest call for the JVM's lifetime.
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

  // decode caches are keyed per (session, kind:path) — a re-ingest of the
  // same dump reuses the cached decode instead of pinning a second copy,
  // and a long-lived service can RELEASE one dump's decode when it is done
  // with it (r13 ADVICE: the previous queue form offered only all-or-
  // nothing eviction, and its evict() nuked every unrelated query-module
  // memo with it). The Memos registration stays as the application-end
  // backstop (session teardown still clears everything).
  private val cachedDecodes = scala.collection.concurrent
    .TrieMap[(SparkSession, String), DataFrame]()
  Memos.register(s => cachedDecodes.keys.filter(_._1 eq s)
    .foreach(k => cachedDecodes.remove(k).foreach(_.unpersist())))

  /** This session's cached decode keys (spec surface). */
  private[graft] def cachedKeys(s: SparkSession): Set[String] =
    cachedDecodes.keys.filter(_._1 eq s).map(_._2).toSet

  // cache-key prefixes, ONE definition for the writers and release() — a
  // third wire format added to one list but not the other would leave its
  // decodes permanently pinned (review r14)
  private val JsonlKey = "jsonl:"
  private val CsvKey = "csv:"
  private val KeyPrefixes = Seq(JsonlKey, CsvKey)

  /** Drop ONE ingested path's cached decode (both wire formats). */
  def release(s: SparkSession, path: String): Unit =
    KeyPrefixes.foreach(k =>
      cachedDecodes.remove((s, k + path)).foreach(_.unpersist()))

  /** Drop this session's cached DECODES only — unrelated query-module
    * memos (fixture tables, signatures, score tables) stay warm.
    */
  def evict(s: SparkSession): Unit =
    cachedDecodes.keys.filter(_._1 eq s)
      .foreach(k => cachedDecodes.remove(k).foreach(_.unpersist()))

  private def cacheTracked(s: SparkSession, key: String,
    df: => DataFrame): DataFrame =
    cachedDecodes.getOrElseUpdate((s, key), { Memos.hook(s); df.cache() })

  /** JSONL corpus dump → documents frame + quarantine.
    *
    * @param quarantineDir if set, malformed raw lines land there as text
    *                      under a content-addressed per-input-path subdir
    *                      (overwritten whole — idempotent under retries)
    *                      before the good frame returns.
    */
  def fromJsonl(spark: SparkSession, path: String,
    quarantineDir: Option[String] = None): Decoded = {
    // text + from_json, NOT the json reader: the raw line survives next to
    // the parse result, so the quarantine is verbatim for EVERY bad shape
    val raw = cacheTracked(spark, JsonlKey + path, spark.read.text(path)
      .select(col("value"), from_json(col("value"), readSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> Corrupt)).as("p")))
    val malformed = col("p").isNull || col("p").getField(Corrupt).isNotNull
    val incomplete =
      col("p").getField("doc_id").isNull || col("p").getField("text").isNull
    val bad = raw.filter(malformed || incomplete)
      .select(col("value").as("raw_line"),
        when(malformed, lit("jsonl decode failed"))
          .otherwise(lit("missing required field (doc_id/text)")).as("reason"))
    writeQuarantine(bad, path, quarantineDir)
    val good = raw.filter(!malformed && !incomplete)
      .select(col("p").getField("doc_id").as("doc_id"),
        col("p").getField("text").as("text"),
        col("p").getField("lang").as("lang"),
        col("p").getField("source").as("source"),
        coalesce(col("p").getField("n_chars"),
          length(col("p").getField("text")).cast("long")).as("n_chars"))
    Decoded(good, bad)
  }

  /** CSV corpus dump (with header) → documents frame + quarantine.
    * Malformed rows quarantine verbatim; parsed-but-missing-required rows
    * re-serialize lossily (see the object note).
    */
  def fromCsv(spark: SparkSession, path: String,
    quarantineDir: Option[String] = None): Decoded = {
    val raw = cacheTracked(spark, CsvKey + path, spark.read
      .schema(readSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .csv(path))
    val bad = raw.filter(
      col(Corrupt).isNotNull || col("doc_id").isNull || col("text").isNull)
      .select(coalesce(col(Corrupt),
        to_json(struct(schema.fieldNames.map(col): _*))).as("raw_line"),
        when(col(Corrupt).isNotNull, lit("csv decode failed"))
          .otherwise(lit("missing required field (doc_id/text)")).as("reason"))
    writeQuarantine(bad, path, quarantineDir)
    val good = raw.filter(
      col(Corrupt).isNull && col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        coalesce(col("n_chars"), length(col("text")).cast("long")).as("n_chars"))
    Decoded(good, bad)
  }

  /** Idempotent quarantine: each INPUT PATH owns a content-addressed
    * subdir, overwritten whole — a failed-and-retried ingest (or a caller
    * decoding the same dump twice) can never double-count the replay queue
    * (the same at-least-once contract as the streaming writers'
    * per-batchId dirs).
    */
  private def writeQuarantine(bad: DataFrame, path: String,
    quarantineDir: Option[String]): Unit =
    quarantineDir.foreach { d =>
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(path.getBytes("UTF-8")).map("%02x".format(_)).mkString
      bad.select("raw_line").write.mode("overwrite").text(s"$d/src=$key")
    }
}
