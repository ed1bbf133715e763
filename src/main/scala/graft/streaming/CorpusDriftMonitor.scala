package graft.streaming

import graft.functions.TextFunctions.{qualityScore, toks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus-drift monitor: the operational companion to the batch
  * coverage checks (q118 OOV rate, q22 quality). A training-data ingest that
  * runs for months needs to notice when the incoming distribution walks away
  * from what the tokenizer/filters were tuned on — a vocabulary shift (OOV
  * climbing) or a quality collapse (spam wave) per arrival window, not per
  * corpus snapshot.
  *
  * Design: the reference vocabulary is a FIXED broadcast surface learned
  * offline (q118's top-K table, refreshed out-of-band) — the stream never
  * aggregates its own vocab, so the state per window is one row of counters.
  * Token membership is per-row HOF arithmetic against the broadcast array
  * (no explode, no join, no extra shuffle); the only stateful operator is
  * the built-in watermarked tumbling-window aggregate. Late docs past the
  * watermark drop, windows finalize incrementally — O(active windows) state
  * regardless of corpus size.
  */
object CorpusDriftMonitor {

  /** Per-window drift counters over a timestamped doc stream.
    *
    * @param docs streaming DataFrame with `ts` (timestamp), `text` (string)
    * @param vocab the learned vocabulary (broadcast-sized, e.g. q118's top-K)
    * @param qualityMin floor below which a doc counts as low-quality
    */
  def drift(docs: DataFrame, vocab: Seq[String], width: String,
    qualityMin: Double, watermark: String = "1 hour"): DataFrame = {
    val tk = toks(col("text"))
    val inVocab = filter(tk, t => t.isInCollection(vocab))
    docs
      .withColumn("n_tokens", size(tk).cast("long"))
      .withColumn("n_oov", (size(tk) - size(inVocab)).cast("long"))
      .withColumn("lowq", (qualityScore(tk) < qualityMin).cast("long"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_oov").as("n_oov"),
        sum("lowq").as("n_low_quality"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / greatest(col("n_tokens"), lit(1L)), 6))
      .withColumn("low_quality_rate",
        round(col("n_low_quality").cast("double") / col("n_docs"), 6))
  }

  /** Land finalized drift windows as an append-only parquet table (the
    * SQL-mountable form — see `CorpusSurface.mountStreams`): watermarked
    * tumbling windows emit exactly once in APPEND mode, so the sink is a
    * plain parquet stream sink (exactly-once via the sink's own log), and
    * the window struct flattens to (win_start, win_end) — `window` is a
    * reserved word downstream, per the house column-naming rule.
    */
  def route(docs: DataFrame, vocab: Seq[String], width: String,
    qualityMin: Double, out: String, checkpointDir: String,
    watermark: String = "1 hour",
    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    drift(docs, vocab, width, qualityMin, watermark)
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("n_docs"), col("n_tokens"), col("n_oov"), col("n_low_quality"),
        col("oov_rate"), col("low_quality_rate"))
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger).start()
}
