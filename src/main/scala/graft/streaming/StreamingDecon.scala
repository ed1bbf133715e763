package graft.streaming

import graft.queries.SimilarityQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING semantic decontamination — the arrival-time half of q135:
  * embedding rows stream in and every vector is screened against the
  * FIXED benchmark surface on arrival, so contaminated content is flagged
  * BEFORE it ever lands in the training corpus (batch q135 is the
  * retro-active audit; this is the gate).
  *
  * Scale shape: the probe surface (eval vectors × multi-probe codes) is
  * computed ONCE at start and broadcast to every micro-batch — an eval
  * suite is fixed and KB-sized while the stream is unbounded, exactly
  * q135's "pin which side grows" rule. Per batch: code the batch
  * (batch × Bands·Bits dot products), one broadcast equi-join on
  * (band, probe), exact cosine on the survivors. Nothing is stateful —
  * a vector's verdict depends only on the stored surface, never its
  * cohort, so any batching of the stream yields identical flags and
  * foreachBatch replays are harmless (per-batchId dirs, overwritten
  * whole, the StreamingAnnServe idempotence contract).
  */
object StreamingDecon {

  /** Start the screen: watch `srcDir` for embedding parquet files, flag
    * every arriving vector against `corpusDir`'s benchmark surface, and
    * write (vec_id, eval_id, cos_sim) under `outDir/batch=<batchId>`.
    */
  def screen(s: SparkSession, srcDir: String, corpusDir: String,
    outDir: String, checkpointDir: String,
    trigger: Trigger = Trigger.AvailableNow(),
    maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val surface = SimilarityQueries.deconEvalSurface(s, corpusDir).cache()
    surface.count() // materialize once, before the first batch
    val schema = org.apache.spark.sql.types.StructType(
      s.read.parquet(s"$corpusDir/embeddings.parquet").schema
        .filter(f => Set("vec_id", "embedding")(f.name)))
    val reader = s.readStream.schema(schema)
    val bounded = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    bounded.parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SimilarityQueries.deconFlagBatch(s, batch, surface)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
