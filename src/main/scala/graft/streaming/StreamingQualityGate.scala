package graft.streaming

import graft.Lineage.LineageCut
import graft.queries.TextQueries
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The STREAMING perplexity-bucket gate — the serve-online half of q154's
  * fit-offline/serve-online split (CCNet's deployment shape): the LM table
  * and the per-language tertile thresholds are FIT once on the reference
  * corpus (both type-level artifacts: vocabulary-sized and |langs|-sized),
  * then every arriving micro-batch is scored and bucketed against them.
  *
  * One definition discipline: the bigram explode
  * ([[TextQueries.docBigrams]]), the integer-average expression
  * ([[TextQueries.SqExprSql]]), the LM ([[TextQueries.lmTable]]), the
  * threshold fit ([[TextQueries.perpThresholds]]), and the bucket rule
  * ([[TextQueries.perpBucketCol]]) are the SAME code batch q154 runs, so
  * the stream==batch law cannot silently diverge.
  *
  * Scale shape: the model BROADCASTS (it is fixed while the stream is
  * unbounded — the q135 "pin which side grows" rule; contrast the batch
  * kernel's SHUFFLE_HASH pin, which is right when both sides are corpus
  * derivatives); scoring is one broadcast join + a map-side-combined
  * per-doc agg per micro-batch; a doc's verdict depends only on the fixed
  * model, never its batch cohort, so any batching yields identical
  * buckets. Unseen bigrams carry no LM row and simply don't score —
  * exactly the batch kernel's inner-join semantics.
  */
object StreamingQualityGate {

  case class Doc(docId: Long, lang: String, text: String)

  /** The fitted artifacts, lineage-cut so serving never re-derives them. */
  case class GateModel(lm: DataFrame, thresholds: DataFrame)

  /** Fit on the reference corpus — rides the shared batch kernels. */
  def fit(s: SparkSession, dir: String): GateModel = {
    val (lm, thr) = TextQueries.perpGateModel(s, dir)
    GateModel(lm.cutLineage(), thr.cutLineage())
  }

  /** Score + bucket one (micro-)batch of docs against the fixed model.
    * Docs with < 2 tokens (no bigrams) or an unfitted language are
    * unscorable and surface with bucket = −1 rather than vanishing.
    */
  def bucketBatch(batch: DataFrame, m: GateModel): DataFrame = {
    val base = batch
      .select(col("docId").as("doc_id"), col("lang"), toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
    val scored = TextQueries.docBigrams(base)
      .join(broadcast(m.lm), "bg")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("nb"), sum("lpq").as("tqs"))
      .withColumn("sq", expr(TextQueries.SqExprSql))
    batch.select(col("docId").as("doc_id"), col("lang"))
      .join(scored.drop("lang"), Seq("doc_id"), "left")
      .join(broadcast(m.thresholds), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        col("sq"),
        when(col("sq").isNull || col("t1").isNull, lit(-1L))
          .otherwise(TextQueries.perpBucketCol).as("bucket"))
  }

  /** Start the gate: each micro-batch's verdicts land under an idempotent
    * per-batchId dir (the house at-least-once contract).
    */
  def route(docs: Dataset[Doc], m: GateModel, out: String,
    checkpointDir: String,
    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.toDF().writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        bucketBatch(b, m).write.mode(SaveMode.Overwrite)
          .parquet(s"$out/batch=$id")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** All verdicts routed so far. */
  def verdicts(s: SparkSession, out: String): DataFrame =
    s.read.parquet(s"$out/batch=*")
}
