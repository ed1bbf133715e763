package graft.streaming

import graft.chain.{ChainConst, RawInput, RawOutput}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mempool transaction with its fetch time (the event-time axis for the
  * dedup watermark — ST5, MempoolSyncer.scala:21-52).
  */
case class MempoolTx(
  txId: String,
  fetchTime: java.sql.Timestamp,
  inputs: Seq[RawInput],
  outputs: Seq[RawOutput])

/** Mempool streaming operators (SURVEY.md §2.9 ST5–ST7). */
object MempoolStream {

  /** ST5: the reference's set-diff of successive mempool snapshots becomes
    * watermarked dropDuplicates — state-store backed, bounded by the
    * watermark horizon instead of an unbounded in-memory snapshot.
    */
  def dedupedTxs(raw: DataFrame, watermark: String = "10 minutes"): DataFrame =
    raw.withWatermark("fetchTime", watermark).dropDuplicates("txId")

  /** ST5 pool-state pairing (MempoolSyncer.scala:21-34): the reference's
    * `stateTransitionByNewTransactions` emits each new tx together with the
    * pool state BEFORE this sync applied, so plugins can diff contexts. The
    * mempool is consensus-bounded (a few thousand txs — the reference holds
    * the whole pool in one in-memory ListMap), so the tracker keeps the id
    * set on the driver and tags each deduped micro-batch with the prior
    * snapshot as a `poolStateBefore` array column.
    */
  final class PoolStateTracker extends Serializable {
    @volatile private var poolIds: Vector[String] = Vector.empty

    /** Tag `batch` (deduped new txs) with the pool ids before it, then fold
      * its ids into the state.
      */
    def pair(batch: DataFrame): DataFrame = {
      val before = poolIds
      val newIds = batch.select("txId").collect().map(_.getString(0)).toVector
      poolIds = (before ++ newIds).distinct
      batch.withColumn("poolStateBefore", typedLit(before))
    }

    /** Full-snapshot sync: drop ids the node no longer reports (mined or
      * expired txs leave the pool between batches).
      */
    def retain(current: Set[String]): Unit =
      poolIds = poolIds.filter(current)

    def snapshot: Seq[String] = poolIds
  }

  /** ST6: per-micro-batch analyzer contract (Plugin.scala:11-30). Receives
    * the batch's new txs (nested) plus the current UTXO snapshot and returns
    * an alert/result DataFrame for the sink.
    */
  trait TxAnalyzer extends Serializable {
    def name: String
    def onNewTransactions(txs: DataFrame, utxo: DataFrame): DataFrame
  }

  /** ST7: high-value transfer detector (HighValueDetector.scala:19-62).
    * Per tx: input value resolved from the UTXO set grouped by script (J6),
    * outputs minus paybacks (scripts already among the inputs — J8) minus
    * fee outputs, summed (A9) and thresholded.
    */
  class HighValueDetector(threshold: Long, feeTreeHash: String) extends TxAnalyzer {
    val name = "high-value-detector"

    def onNewTransactions(txs: DataFrame, utxo: DataFrame): DataFrame = {
      val inputs = txs.select(col("txId"),
        explode(col("inputs")).as("i")).select(col("txId"), col("i.boxId").as("boxId"))
      // J6: resolve spent boxes against the live UTXO snapshot
      val inScripts = inputs
        .join(utxo.select("boxId", "ergValue", "ergoTreeHash"), Seq("boxId"))
        .groupBy("txId", "ergoTreeHash").agg(sum("ergValue").as("inValue"))

      val outputs = txs.select(col("txId"), explode(col("outputs")).as("o"))
        .select(col("txId"), col("o.value").as("value"),
          graft.functions.CryptoFunctions.sha256OfHex(col("o.ergoTree")).as("ergoTreeHash"))
        .filter(col("ergoTreeHash") =!= feeTreeHash)
      // J8: payback exclusion
      val external = outputs.join(
        inScripts.select("txId", "ergoTreeHash"), Seq("txId", "ergoTreeHash"), "left_anti")

      external
        .groupBy("txId")
        .agg(sum("value").as("transferredValue"), count(lit(1)).as("nOutputs"))
        .filter(col("transferredValue") >= threshold)
        .withColumn("alert", lit(name))
    }
  }

  /** Drive analyzers per micro-batch (PluginManager.executePlugins:19-49 —
    * failures are logged per-plugin, not propagated).
    */
  def runAnalyzers(
    analyzers: Seq[TxAnalyzer], txs: DataFrame, utxo: DataFrame): Map[String, DataFrame] =
    analyzers.flatMap { a =>
      try Some(a.name -> a.onNewTransactions(txs, utxo))
      catch {
        case e: Exception =>
          System.err.println(s"[analyzer ${a.name}] failed: ${e.getMessage}")
          None
      }
    }.toMap

  /** The full mempool pipeline as one streaming query (ST5+ST6+ST7):
    * watermarked dedup → per-batch analyzer dispatch against the CURRENT
    * UTXO snapshot (`utxo` is re-evaluated each batch, so a concurrently
    * running chain ingest is always joined at its latest revision) → alert
    * sink callback.
    */
  def start(
    rawTxs: DataFrame,
    utxo: () => DataFrame,
    analyzers: Seq[TxAnalyzer],
    checkpoint: String,
    onResult: (String, DataFrame) => Unit,
    watermark: String = "10 minutes"): org.apache.spark.sql.streaming.StreamingQuery =
    dedupedTxs(rawTxs, watermark).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          runAnalyzers(analyzers, batch, utxo()).foreach { case (n, df) => onResult(n, df) }
      }
      .start()
}
