package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation (SURVEY.md §2.9 closing note: the
  * reference has no event-time notion beyond block height; the Spark engine
  * exposes real watermarked windows as a beyond-parity capability).
  *
  * All three window shapes are the built-in state-store operators —
  * incremental, watermark-bounded state, late data dropped past the horizon.
  * The same calls work in batch (q18 is the tumbling batch form, oracle
  * checked).
  */
object EventTimeWindows {

  /** Tumbling count/sum per (window, key). */
  def tumbling(events: DataFrame, tsCol: String, keyCol: String, width: String,
    watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Sliding windows (width, slide). */
  def sliding(events: DataFrame, tsCol: String, keyCol: String, width: String,
    slide: String, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Session windows with an inactivity gap. */
  def session(events: DataFrame, tsCol: String, keyCol: String, gap: String,
    watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
}
