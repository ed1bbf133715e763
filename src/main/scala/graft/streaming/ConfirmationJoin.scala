package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (§2.9 beyond parity): the mempool tx stream
  * joined to the block-confirmation stream — "which pending tx confirmed,
  * and how long did it wait?". This is the watermarked two-stream join
  * Structured Streaming is built for:
  *
  *  - both sides carry event-time watermarks, so the state store provably
  *    evicts: a mempool tx that never confirms inside `horizon` ages out of
  *    state instead of accumulating forever (the unbounded-state trap of
  *    naive stream joins);
  *  - the join condition is an equi-key (txId) PLUS the time interval —
  *    Spark plans it as a keyed state-store lookup, never a scan;
  *  - at 100 TB-scale ingest the state per key is one small row, and the
  *    watermark bounds total state by (horizon × arrival rate).
  *
  * The same plan shape serves any "pending event meets its resolution"
  * pairing (order↔fill, request↔response).
  */
object ConfirmationJoin {

  /** `pending`: (txId, seenAt) mempool arrivals. `confirmed`: (txId,
    * confirmedAt, height) from the block stream. Inner-joins pairs where
    * the confirmation lands within [seenAt, seenAt + horizon], emitting the
    * wait in seconds. Both watermarks are `horizon` so neither side's state
    * outlives the interval it could still join against.
    */
  def confirmations(pending: DataFrame, confirmed: DataFrame,
    horizon: String = "30 minutes"): DataFrame = {
    val p = pending.select(col("txId"), col("seenAt"))
      .withWatermark("seenAt", horizon)
    val c = confirmed.select(col("txId").as("cTxId"), col("confirmedAt"),
      col("height"))
      .withWatermark("confirmedAt", horizon)
    p.join(c,
        col("txId") === col("cTxId") &&
          col("confirmedAt") >= col("seenAt") &&
          col("confirmedAt") <= col("seenAt") + expr(s"INTERVAL $horizon"))
      .select(col("txId"), col("seenAt"), col("confirmedAt"), col("height"),
        (unix_micros(col("confirmedAt")) - unix_micros(col("seenAt")))
          .cast("double").divide(1000000.0).as("waitS"))
  }
}
