package graft.streaming

import graft.queries.DiversitySketches
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The STREAMING half of the ingest-time diversity-sketch tier: each
  * arriving micro-batch's grams are sketched per (bucket, source, n) and
  * APPENDED under an idempotent per-batchId dir (the house at-least-once
  * contract — a replayed batch overwrites its own dir, never double-adds
  * into a shared file). Readers union-merge ALL rows ever appended: a
  * bucket wholly owned by one micro-batch appends the byte-identical row
  * the batch materializer writes (aligned stream == batch exactly); a
  * bucket split across micro-batches yields partial rows whose union
  * estimate agrees within the sketch's own RSE, with exact totals (the
  * merge laws Round15Spec pins — see [[DiversitySketches]]). No state
  * store: the sketch rows ARE the state, and they live in the warehouse.
  */
object StreamingDiversitySketch {

  case class Doc(docId: Long, source: String, text: String)

  /** Sketch one (micro-)batch — the SAME kernel the batch materializer
    * runs ([[DiversitySketches.sketchRows]]), on the batch's docs only.
    */
  def sketchBatch(batch: DataFrame): DataFrame =
    DiversitySketches.sketchRows(
      batch.select(batch("docId").as("doc_id"), batch("source"), batch("text")))

  def start(docs: Dataset[Doc], out: String, checkpointDir: String,
    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.toDF().writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        sketchBatch(b).write.mode(SaveMode.Overwrite)
          .parquet(s"$out/batch=$id")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** All sketch rows appended so far (the union-merge input). */
  def sketches(s: SparkSession, out: String): DataFrame =
    s.read.parquet(s"$out/batch=*")
}
